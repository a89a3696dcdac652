package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond parquet/CSV/JSON: ORC (built into
  * Spark — orc-core ships in the image's jars; spark-avro does not, so
  * Avro stays out of scope). Checks the full round trip: partitioned
  * write, schema preservation, partition-pruned + predicate-pushed
  * reads — the same contracts MeasurementIngestSpec pins for parquet.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("formats-spec")

  test("ORC round trip: partitioned write, pruned read, pushed filters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orc-fmt").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("year", year($"o_orderdate"))
    df.write.mode("overwrite").partitionBy("year").orc(dir)

    val back = spark.read.orc(dir)
    // schema preserved (year becomes a partition column at the end)
    assert(back.columns.toSet == df.columns.toSet)
    assert(back.count() == df.count())

    // partition pruning: only the matching year directory is read
    val pruned = back.filter($"year" === 1996 && $"o_totalprice" > 1000.0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(year"),
      s"partition filter not pushed:\n$plan")
    // predicate pushdown reaches the ORC scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(o_totalprice"), s"predicate not pushed:\n$plan")
    // values identical to the parquet-side computation
    val want = df.filter($"year" === 1996 && $"o_totalprice" > 1000.0).count()
    assert(pruned.count() == want)
  }

  test("ORC preserves exact values across the round trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orc-exact").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(500)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    val a = src.orderBy($"l_orderkey", $"l_linenumber").collect().map(_.toString)
    val b = back.orderBy($"l_orderkey", $"l_linenumber").collect().map(_.toString)
    assert(a.sameElements(b)) // doubles and timestamps bit-preserved
  }
}
