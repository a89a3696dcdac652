package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sinks

/** S8 driver-checkable: the JDBC export path the reference runs against
  * Postgres (`export_to_postgres.py:28-36`, `consumer1.py:93-103`),
  * exercised end-to-end against embedded Derby (in Spark's jar set, no
  * server) — overwrite semantics, type mapping, and the read-back.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("jdbc-sink-spec")

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("derby-db")
    dir.toFile.delete() // derby wants to create the directory itself
    s"jdbc:derby:$dir;create=true"
  }

  test("S8: overwrite export + read-back round trip (embedded Derby)") {
    import spark.implicits._
    val url = derbyUrl()
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.25), (3L, "gamma", -0.75))
      .toDF("id", "name", "score")
    Sinks.jdbcOverwrite(df, url, "results")
    // overwrite again with different rows — the reference's per-run export
    val df2 = Seq((10L, "delta", 4.0), (11L, "epsilon", 8.0))
      .toDF("id", "name", "score")
    Sinks.jdbcOverwrite(df2, url, "results")
    val back = Sinks.jdbcRead(spark, url, "results")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == Seq((10L, "delta", 4.0), (11L, "epsilon", 8.0)))
  }

  test("S8+S9: foreachBatch streaming export lands every batch in the table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val url = derbyUrl()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    mem.addData((1L, 10.0), (2L, 20.0), (1L, 30.0))
    Sinks.runAvailableNow(
      mem.toDF().toDF("user_id", "value"),
      Files.createTempDirectory("ckpt-jdbc").toString) { df =>
      df.groupBy("user_id").agg(sum("value").as("total"))
    } { batch =>
      Sinks.jdbcOverwrite(batch, url, "stream_out")
    }
    val back = Sinks.jdbcRead(spark, url, "stream_out")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(back.toSeq == Seq((1L, 40.0), (2L, 20.0)))
  }
}
