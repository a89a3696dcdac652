package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults tuned for the test harness (local[32], 128 GiB);
  * on a real cluster the same builder settings apply except master/memory,
  * which spark-submit owns. AQE is on so skewed shuffles re-plan at
  * runtime — at 100 TB that (plus `coalescePartitions`) replaces most
  * hand-tuning of `spark.sql.shuffle.partitions`.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime row-level filtering: let the optimizer inject a Bloom
      // filter from a selective build side into the probe-side scan
      // (the automatic sibling of the explicit BloomPrune operator;
      // pays off on fact⋈dim at scale, harmless locally)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // storage-partitioned joins: honor KeyGroupedPartitioning reported
      // by V2 scans (graftgen keyGrouped mode, Iceberg-style tables) so
      // co-partitioned joins/aggregations skip the shuffle entirely
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Hive-compatible (non-ANSI) semantics: null on divide-by-zero,
      // wrapping long arithmetic (the hash mixers rely on it). The
      // reference runs Spark 3.0 where this was the only behavior.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
  }

  /** Local session for tests / CLI mains. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = builder(appName).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
