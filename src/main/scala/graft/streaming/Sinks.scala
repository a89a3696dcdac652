package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sink runners (SURVEY.md §2.1 S9, §2.7 T4–T6).
  *
  * The reference pattern: `writeStream.outputMode(...).trigger(once)
  * .foreachBatch(save)` with an empty-batch guard (ASVSP
  * `consumer1.py:93-113`). `Trigger.AvailableNow()` is the modern
  * equivalent of trigger-once — it drains everything available, possibly
  * in multiple rate-limited batches, then stops; with a fresh checkpoint
  * and no rate limits it reproduces the reference's one-batch semantics.
  *
  * `foreachBatch` receives a plain batch DataFrame, which is where the
  * non-incremental analytics (rank / lag — [[StreamJobs.sq2TrendAnalyze]]
  * etc.) run before the write, exactly like the reference defers them to
  * the micro-batch.
  */
object Sinks {

  /** Run a streaming frame to completion through `foreachBatch`,
    * applying `analyze` to each micro-batch and passing the result to
    * `save`. Empty batches are skipped with `df.isEmpty` (NOT
    * `rdd.isEmpty` — no RDD materialization).
    */
  def runAvailableNow(stream: DataFrame, checkpoint: String,
                      outputMode: String = "update")
                     (analyze: DataFrame => DataFrame)
                     (save: DataFrame => Unit): StreamingQuery = {
    val q = stream.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (!df.isEmpty) save(analyze(df))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** S2-style partitioned parquet append used as the batch-result sink
    * (replaces the reference's JDBC sink in environments without a DB).
    */
  def appendParquet(path: String, partitionCols: Seq[String] = Nil)(df: DataFrame): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** S8: JDBC batch sink, overwrite per run like the reference's export
    * (`export_to_postgres.py:28-36`). Driver-checkable without a server
    * via embedded Derby (ships in Spark's jars) — see JdbcSinkSpec's
    * round trip; on a cluster, point `url`/`driver` at Postgres with no
    * code change.
    */
  def jdbcOverwrite(df: DataFrame, url: String, table: String,
                    user: String = "", password: String = "",
                    driver: String = ""): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
    (if (driver.nonEmpty) w.option("driver", driver) else w)
      .mode("overwrite").save()
  }

  /** S8 read side: load a JDBC table back (the export verification the
    * reference does by querying Postgres).
    */
  def jdbcRead(spark: SparkSession, url: String, table: String,
               driver: String = ""): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    (if (driver.nonEmpty) r.option("driver", driver) else r).load()
  }
}
