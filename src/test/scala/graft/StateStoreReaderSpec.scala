package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `statestore` / `state-metadata` batch readers — offline
  * inspection of a streaming checkpoint's RocksDB/HDFS state (the ops
  * surface for debugging a live 100 TB pipeline's state without
  * touching the running query: row counts per operator, hot keys,
  * stuck aggregates). The spec pins EXACTNESS, not just readability:
  * the state rows read back from disk equal the aggregation state the
  * stream last committed.
  */
class StateStoreReaderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("statestore-reader-spec")

  test("statestore source reads back exact per-key aggregation state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val mem = MemoryStream[(Long, Long)]
      val counts = mem.toDS().toDF("k", "v").groupBy($"k").agg(sum($"v").as("s"))
      val ckpt = java.nio.file.Files.createTempDirectory("ckpt-ssr").toString
      val q = counts.writeStream.format("memory").queryName("ssr_sink")
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      mem.addData((1L, 10L), (2L, 20L), (1L, 5L))
      q.processAllAvailable()
      // second batch: state must reflect the LATEST committed snapshot
      mem.addData((2L, 2L), (3L, 7L))
      q.processAllAvailable()
      q.stop()
      val state = spark.read.format("statestore").load(ckpt)
        .select($"key.k", $"value.sum").as[(Long, Long)].collect().toMap
      assert(state == Map(1L -> 15L, 2L -> 22L, 3L -> 7L))
      val md = spark.read.format("state-metadata").load(ckpt)
        .select($"operatorName", $"numPartitions", $"maxBatchId")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      assert(md.toSeq == Seq(("stateStoreSave", 4, 1L)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
