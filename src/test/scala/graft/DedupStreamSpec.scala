package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.{DedupStream, Replay}

/** Streaming LSH dedup ([[DedupStream]]): the candidate-pair SET must
  * equal the batch LSH self-join's on the same corpus, independent of
  * micro-batch boundaries — and the interesting pairs must actually
  * CROSS batches through bucket state (the replay is split so no
  * original shares a batch with its mutant).
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("dedup-stream-spec")

  test("streaming candidate set == batch LSH; recovered pairs cross micro-batches") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    // 8 docs + 8 tail-truncated mutants: enough shared shingles that
    // every (doc, mutant) pair shares at least one band
    val words = (0 until 40).map(i => s"w$i")
    val base = (0 until 8).map { d =>
      (d.toLong, (0 until 25).map(i => words((d * 3 + i * 2) % 40)).mkString(" "))
    }.toDF("doc_id", "norm")
    val mutants = base.select(($"doc_id" + 100L).as("doc_id"),
      $"norm".substr(lit(1), length($"norm") - 12).as("norm"))
    def withBands(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("sig", call_function("graft_minhash32_w3",
        graft.operators.TextOps.tokens($"norm")))
    // batch truth
    val batchPairs = Dedup.lshCandidatePairs(
      withBands(base.unionByName(mutants)), $"doc_id", $"sig", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce candidates")
    // stream: originals then mutants — every recovered pair crosses
    val replay = Files.createTempDirectory("d06-spec-replay").toString
    Replay.writeSlices(replay, Seq(base, mutants))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("norm",
        org.apache.spark.sql.types.StringType)))
    val stream = withBands(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(replay))
      .withColumn("bandKey", explode(Dedup.lshBandKeys($"sig", 8, 4)))
      .select($"bandKey", $"doc_id".as("id"), $"sig")
      .as[DedupStream.BandArrival]
    val ckpt = Files.createTempDirectory("d06-spec-ckpt").toString
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try DedupStream.candidatePairs(stream)
        .writeStream.format("memory").queryName("d06spec")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      finally spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", beforeProvider)
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "the replay must execute as at least two non-empty micro-batches")
    val emitted = spark.table("d06spec").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(emitted.toSet == batchPairs,
      s"stream candidates must equal batch LSH: ${emitted.toSet} vs $batchPairs")
    // every original→mutant pair is CROSS-BATCH by construction: id_a
    // arrived in batch 1, id_b (=id_a+100) in batch 2 — state, not a
    // within-batch join, produced it
    assert(batchPairs.exists { case (a, b) => b == a + 100L },
      "fixture must recover at least one mutant pair")
    // per shared bucket exactly one emission; multi-bucket pairs emit
    // once per bucket — never more than the band count
    val counts = emitted.groupBy(identity).view.mapValues(_.length)
    assert(counts.values.forall(_ <= 8), s"over-emission: ${counts.toMap}")
  }

  test("hot-bucket cap: pairing stops at the cap with a loud poisoned signal; below-cap pairs all stand") {
    import spark.implicits._
    // a PLANTED hot bucket: every doc lands in band key 77 — uncapped
    // this is C(11,2) = 55 pairs of O(n²) output
    def arr(ids: Seq[Long]) =
      ids.map(i => (77L, i, Array(i))).toDF("bandKey", "id", "sig")
    val replay = Files.createTempDirectory("d06-cap-replay").toString
    // batch 2 carries id 0 — SMALLER than every admitted member, so a
    // refusal there proves poisoning is a bucket state, not an id order
    Replay.writeSlices(replay, Seq(arr(1L to 6L), arr(Seq(0L, 7L, 8L, 9L, 10L))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bandKey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(replay)
      .as[DedupStream.BandArrival]
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // record-level: the full event stream, cap = 4
      val ckpt1 = Files.createTempDirectory("d06-cap-ckpt1").toString
      DedupStream.events(stream, maxBucketMembers = 4)
        .writeStream.format("memory").queryName("d06cap")
        .outputMode("append").option("checkpointLocation", ckpt1)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      val ev = spark.table("d06cap").collect()
      val pairs = ev.filter(_.isNullAt(4)).map(r => (r.getLong(0), r.getLong(1)))
      // batch 1 arrivals sort to 1..6: ids 1–4 fill the bucket and pair
      // completely (never silently dropped); 5, 6 and all of batch 2
      // are refused — capped work: 6 pairs, not 55
      assert(pairs.toSet ==
        (for (a <- 1L to 4L; b <- (a + 1L) to 4L) yield (a, b)).toSet,
        s"got ${pairs.toSeq.sorted}")
      val poison = ev.filter(!_.isNullAt(4))
      assert(poison.length == 7, s"7 refused arrivals: ${poison.length}")
      assert(poison.forall(r => r.getLong(4) == 77L && r.getLong(1) == 4L),
        "each poisoned record names the bucket and its frozen size")
      assert(poison.map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 5L, 6L, 7L, 8L, 9L, 10L))
      // the production surface: candidatePairs filters poison records
      // but counts them per micro-batch as an OBSERVED metric
      val ckpt2 = Files.createTempDirectory("d06-cap-ckpt2").toString
      val q = DedupStream.candidatePairs(stream, maxBucketMembers = 4)
        .writeStream.format("memory").queryName("d06capm")
        .outputMode("append").option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("lsh_dedup")))
        .map(_.getLong(0)).sum
      assert(observed == 7L,
        s"poisoned_arrivals must count every refusal loudly: $observed")
      assert(spark.table("d06capm").count() == 6L)
      // TWO CAPS on the SAME corpus through the session-conf surface
      // (what d06 reads): cap 8 admits 1..6 then 0 and 7, so 15 + 6 + 7
      // = 28 pairs with 3 refusals — the cap is a per-query dial, the
      // metric name never moves
      spark.conf.set(DedupStream.BucketCapConf, "8")
      try {
        assert(DedupStream.configuredCap(spark) == 8)
        val ckpt3 = Files.createTempDirectory("d06-cap-ckpt3").toString
        val q8 = DedupStream.candidatePairs(stream,
            DedupStream.configuredCap(spark))
          .writeStream.format("memory").queryName("d06cap8")
          .outputMode("append").option("checkpointLocation", ckpt3)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q8.awaitTermination()
        assert(spark.table("d06cap8").count() == 28L,
          "a wider cap admits more members before poisoning")
        val observed8 = q8.recentProgress.toSeq
          .flatMap(p => Option(p.observedMetrics.get("lsh_dedup")))
          .map(_.getLong(0)).sum
        assert(observed8 == 3L, s"8, 9, 10 refused: $observed8")
      } finally spark.conf.unset(DedupStream.BucketCapConf)
      // unset -> the default cap again
      assert(DedupStream.configuredCap(spark) == DedupStream.DefaultBucketCap)
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", beforeProvider)
  }
}
