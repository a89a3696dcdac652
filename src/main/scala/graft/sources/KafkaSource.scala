package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka streaming sources (SURVEY.md §2.1 S5–S7).
  *
  * Builder API mirrors the reference's consumers: subscribe one topic
  * (`consumer1.py:38-43`) or several with later demux on the `topic`
  * column (`consumer4.py:51-61`), then JSON-decode the value. The decode
  * step ([[parseJson]]) is a pure transform shared with tests — it runs
  * identically on a batch frame of raw strings, so the parsing contract
  * is verified without a broker (the spark-sql-kafka connector jar is an
  * add-on at deploy time).
  */
object KafkaSource {

  /** Event payload schema for the JSON stream (hand-declared like the
    * reference's `consumer1.py:14-27` — no inference on streams).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  /** The record schema the Kafka connector delivers (fixed by the
    * spark-sql-kafka contract) — declared here so the downstream
    * transforms can be driven against connector-shaped frames in tests
    * without a broker.
    */
  val kafkaRecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** S5/S6: subscribe to one or more topics. `startingOffsets` governs
    * FIRST-run position only — afterwards the checkpoint owns progress
    * (the recovery contract exercised broker-free in StreamingSpec's
    * crash-restart test). `maxOffsetsPerTrigger` bounds micro-batch
    * size so a backlogged topic drains in rate-limited batches instead
    * of one giant one.
    */
  def readStream(spark: SparkSession, bootstrap: String, topics: Seq[String],
                 startingOffsets: String = "earliest",
                 maxOffsetsPerTrigger: Option[Long] = None,
                 failOnDataLoss: Boolean = true): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
    maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }

  /** Broker-free behavioral stand-in for the remaining S5 option
    * surface, driven over connector-shaped parquet records
    * ([[kafkaRecordSchema]]) — the options previously covered only at
    * compile level get REAL semantics here:
    *
    *   - `failOnDataLoss`: the connector's data-loss contract. A gap
    *     in a (topic, partition)'s offset sequence means records aged
    *     out between runs; `true` throws `IllegalStateException`
    *     naming the first gapped partition BEFORE any batch runs,
    *     `false` is the connector's log-and-continue mode. The check
    *     is one tiny aggregate (per-partition min/max/count) — its
    *     1-row `take` is a scalar result, not a driver-side data loop.
    *   - `maxOffsetsPerTrigger`: the replay is re-bucketed into files
    *     of at most `max` records (ordered by topic, partition,
    *     offset) and streamed with `maxFilesPerTrigger = 1`, so every
    *     micro-batch carries at most `max` offsets — the connector's
    *     rate-limit shape, observable batch by batch. The global
    *     ordering window is emulation-only cost on a bounded replay
    *     (a real connector slices offset RANGES per partition).
    *
    * Returns a STREAMING frame of connector-shaped records; compose
    * with [[parseJson]] exactly like the broker path.
    */
  def replayStream(spark: SparkSession, srcDir: String,
                   maxOffsetsPerTrigger: Option[Long] = None,
                   failOnDataLoss: Boolean = true): DataFrame = {
    val raw = spark.read.schema(kafkaRecordSchema).parquet(srcDir)
    if (failOnDataLoss) {
      val gap = raw.groupBy(col("topic"), col("partition"))
        .agg(min(col("offset")).as("lo"), max(col("offset")).as("hi"),
          countDistinct(col("offset")).as("n"))
        .filter(col("hi") - col("lo") + 1 =!= col("n"))
        .orderBy(col("topic"), col("partition"))
        .take(1)
      gap.headOption.foreach { g =>
        throw new IllegalStateException(
          s"offset gap in topic=${g.getString(0)} partition=${g.getInt(1)}: " +
            s"range [${g.getLong(2)}, ${g.getLong(3)}] holds only ${g.getLong(4)} " +
            "offsets (failOnDataLoss=true)")
      }
    }
    val streamDir = maxOffsetsPerTrigger match {
      case Some(m) =>
        require(m > 0, "need maxOffsetsPerTrigger > 0")
        import org.apache.spark.sql.expressions.Window
        // Per-invocation dir (the memory sinks' UUID convention): two
        // concurrent streams over the same srcDir must not clobber each
        // other's slice files mid-read.
        val sliced = srcDir.stripSuffix("/") + "-sliced-" +
          java.util.UUID.randomUUID().toString.take(8)
        val w = Window.orderBy(col("topic"), col("partition"), col("offset"))
        raw.withColumn("slice",
            floor((row_number().over(w) - 1).cast("long") / m))
          .write.mode("overwrite").partitionBy("slice").parquet(sliced)
        s"$sliced/slice=*"
      case None => srcDir
    }
    spark.readStream.schema(kafkaRecordSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
  }

  /** S7: decode the Kafka `value` bytes as JSON and flatten; keeps
    * `topic` for multi-topic demux. Works on any frame with
    * (`value`, `topic`) columns — batch or streaming. `keep` names
    * additional connector columns to carry through the flatten (e.g.
    * `offset` for downstream exactly-once dedup, `key` for compaction
    * semantics). Malformed payloads follow `from_json`'s PERMISSIVE
    * contract: the row survives with every decoded field null — the
    * q42 oracle pins that end to end.
    */
  def parseJson(raw: DataFrame, schema: StructType = eventSchema,
                keep: Seq[String] = Nil): DataFrame = {
    val parsed = raw.withColumn("d", from_json(col("value").cast("string"), schema))
    val passthrough =
      (if (raw.columns.contains("topic")) Seq("topic") else Nil) ++ keep
    parsed.select(passthrough.map(col) :+ col("d.*"): _*)
  }
}
