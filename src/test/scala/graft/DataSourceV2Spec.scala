package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeExprs

/** [[graft.sources.GenSource]] — the DataSource V2 connector contract.
  * Pins the three scan-build behaviors a 100 TB source lives by
  * (filter pushdown that prunes TASKS, column pruning that reaches the
  * reader, post-pushdown statistics) plus content correctness against
  * a driver-side replay of the generator.
  */
class DataSourceV2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("dsv2-spec")

  private def gen(rows: Long, slices: Int) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansIn(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansIn)
    }

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    scansIn(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no BatchScanExec in plan:\n" +
        df.queryExecution.executedPlan.toString))

  test("row content matches the driver-side splitmix64 replay") {
    val got = gen(500, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val want = (0L until 500L).map { i =>
      val h = NativeExprs.mix64(i)
      (i, ((h >>> 8) & 15L).toInt, (h >>> 16) & 0xffffL)
    }
    assert(got.toSeq == want)
  }

  private def filterNodes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.size

  test("id range filter pushes into the scan: shards pruned, Filter node gone") {
    val df = gen(1000, 10).filter(col("id") >= 420L && col("id") < 580L)
    df.collect()
    val scan = batchScan(df)
    // fixed shards of 100 ids; [420,580) intersects shards 4 and 5 only
    assert(scan.inputPartitions.size == 2,
      s"expected 2 surviving shards, scan: ${scan.scan.description()}")
    assert(scan.scan.description().contains("range=[420,580)"))
    // the source absorbed the predicates, so no post-scan Filter remains
    assert(filterNodes(df) == 0, "pushed filter must delete the Filter node")
    assert(df.count() == 160)
  }

  test("equality and open-interval predicates narrow correctly") {
    assert(gen(1000, 10).filter(col("id") === 7L).collect().map(_.getLong(0)).toSeq == Seq(7L))
    val one = gen(1000, 10).filter(col("id") === 7L)
    one.collect()
    assert(batchScan(one).inputPartitions.size == 1)
    assert(gen(100, 4).filter(col("id") > 97L).count() == 2)
    assert(gen(100, 4).filter(col("id") <= 1L).count() == 2)
    // contradictory bounds plan zero tasks and return zero rows
    val none = gen(100, 4).filter(col("id") >= 90L && col("id") < 10L)
    assert(none.count() == 0)
  }

  test("column pruning reaches the reader schema") {
    val df = gen(100, 4).select(col("category"))
    df.collect()
    val scan = batchScan(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("category"),
      s"reader must see only the pruned column, got ${scan.scan.readSchema()}")
    // count(*) prunes everything: zero-field reader rows still count
    assert(gen(12345, 7).count() == 12345)
  }

  test("statistics report the post-pushdown row count") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val df = gen(1000, 10).filter(col("id") >= 420L && col("id") < 580L)
    df.collect()
    val stats = batchScan(df).scan.asInstanceOf[SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 160)
  }

  test("non-id predicates stay post-scan and still evaluate correctly") {
    val df = gen(1000, 10).filter(col("category") === 3)
    val got = df.count()
    val want = (0L until 1000L).count(i => ((NativeExprs.mix64(i) >>> 8) & 15L) == 3L)
    assert(got == want)
    df.collect()
    // the category predicate cannot be absorbed: a Filter node must remain
    assert(filterNodes(df) >= 1, "unabsorbed predicate needs a post-scan Filter")
  }

  private def drainStream(rows: Long, rowsPerBatch: Long, ckpt: String,
      sink: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = spark.readStream.format("graftgen")
      .option("rows", rows.toString).option("rowsPerBatch", rowsPerBatch.toString)
      .option("slices", "4").load()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  test("micro-batch stream: admission-controlled pacing, streamed content == batch content") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-graftgen").toString
    val sink = "gen_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = drainStream(rows = 1000, rowsPerBatch = 300, ckpt, sink)
    // 1000 rows at <=300/batch: exactly 4 data batches (300+300+300+100)
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    assert(dataBatches.toSeq == Seq(300L, 300L, 300L, 100L),
      s"admission control must pace 300/300/300/100, got ${dataBatches.mkString(",")}")
    val streamed = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val batch = gen(1000, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(streamed == batch, "streamed rows must equal the batch read exactly")
  }

  test("micro-batch stream: restart resumes from the committed offset, exactly-once") {
    // memory sink can't recover a checkpoint; the parquet sink (file-log
    // fault tolerance) is the restart-capable counterpart
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-graftgen-rs").toString
    val out = java.nio.file.Files.createTempDirectory("out-graftgen-rs").toString
    def drainToFiles(rows: Long): Unit = {
      val q = spark.readStream.format("graftgen")
        .option("rows", rows.toString).option("rowsPerBatch", "250")
        .option("slices", "4").load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainToFiles(600)
    assert(spark.read.parquet(out).count() == 600)
    // extend the extent and restart on the SAME checkpoint: only the
    // new interval [600, 1500) is emitted — nothing reprocessed
    drainToFiles(1500)
    val resumed = spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(resumed == (0L until 1500L).toSeq,
      s"restart must append exactly [600,1500) once, got ${resumed.size} rows")
  }

  test("v2 write: sink-required clustering and ordering are planner-enforced") {
    import graft.sources.ClusteredSink
    val tag = "w_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // shuffle the write input so neither requirement holds accidentally
    gen(1000, 4).orderBy(col("value"))
      .select(col("category"), col("id"), col("value"))
      .write.format("graftsink")
      .option("clusterBy", "category").option("sortBy", "id").option("tag", tag)
      .mode("append").save()
    val parts = ClusteredSink.committed.get(tag)
    assert(parts != null && parts.map(_.rows.size).sum == 1000)
    // clustering: every category value lands in exactly one writer task
    val catParts = parts.toSeq
      .flatMap(p => p.rows.map(r => (r.head, p.partitionId))).distinct
      .groupBy(_._1).map { case (c, ps) => c -> ps.size }
    assert(catParts.values.forall(_ == 1),
      s"each category must hit one task, got $catParts")
    assert(catParts.size == 16)
    // ordering: ids ascend within every task (the sink never re-sorts)
    parts.foreach { p =>
      val ids = p.rows.map(_(1).asInstanceOf[Long])
      assert(ids == ids.sorted, s"task ${p.partitionId} not sorted by id")
    }
    // exact roundtrip: the written multiset is the generated table
    val written = parts.toSeq.flatMap(_.rows)
      .map(r => (r(1).asInstanceOf[Long], r.head.asInstanceOf[Int],
        r(2).asInstanceOf[Long])).sortBy(_._1)
    val want = gen(1000, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(written == want)
  }

  test("v2 write: a failing task aborts the job and commits nothing") {
    import graft.sources.ClusteredSink
    val tag = "a_" + java.util.UUID.randomUUID().toString.replace("-", "")
    intercept[Exception] {
      gen(100, 4).select(col("category"), col("id"), col("value"))
        .write.format("graftsink")
        .option("clusterBy", "category").option("sortBy", "id").option("tag", tag)
        .option("failOnSortValue", "50") // planted writer fault mid-stream
        .mode("append").save()
    }
    assert(!ClusteredSink.committed.containsKey(tag), "aborted write must not commit")
  }

  test("v2 streaming write: per-epoch commits, layout enforced, union exactly-once") {
    import graft.sources.ClusteredSink
    val tag = "s_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-graftsink").toString
    val q = spark.readStream.format("graftgen")
      .option("rows", "1000").option("rowsPerBatch", "300").option("slices", "4").load()
      .select(col("category"), col("id"), col("value"))
      .writeStream.format("graftsink")
      .option("clusterBy", "category").option("sortBy", "id").option("tag", tag)
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val epochs = ClusteredSink.committedEpochs.asScala
      .collect { case ((t, e), parts) if t == tag => e -> parts }.toMap
    assert(epochs.size == 4, s"300/300/300/100 pacing => 4 epochs, got ${epochs.keySet}")
    // layout requirements hold INSIDE each micro-batch's write
    epochs.values.foreach { parts =>
      parts.foreach { p =>
        val ids = p.rows.map(_(1).asInstanceOf[Long])
        assert(ids == ids.sorted)
      }
      val catParts = parts.toSeq.flatMap(p => p.rows.map(r => (r.head, p.partitionId)))
        .distinct.groupBy(_._1).map { case (c, ps) => c -> ps.size }
      assert(catParts.values.forall(_ == 1), s"per-epoch clustering violated: $catParts")
    }
    // epochs partition the id space: union is exactly [0, 1000)
    val all = epochs.values.flatten.flatMap(_.rows.map(_(1).asInstanceOf[Long])).toSeq.sorted
    assert(all == (0L until 1000L).toSeq)
  }

  private def finalPlanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  test("storage-partitioned join: key-grouped scans aggregate and join with ZERO exchanges") {
    def kg(rows: Long, grouped: Boolean) = spark.read.format("graftgen")
      .option("rows", rows.toString).option("keyGrouped", grouped.toString).load()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def pipeline(grouped: Boolean) = {
        val a = kg(2000, grouped).groupBy(col("category"))
          .agg(sum(col("value")).as("sv"))
        val b = kg(3000, grouped).groupBy(col("category"))
          .agg(count(lit(1)).as("n"))
        a.join(b, "category")
      }
      val spj = pipeline(grouped = true)
      val spjRows = spj.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(!finalPlanString(spj).contains("Exchange"),
        s"key-grouped join must need no exchange:\n${finalPlanString(spj)}")
      // the detector isn't vacuous: the ungrouped path shuffles...
      val base = pipeline(grouped = false)
      val baseRows = base.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(finalPlanString(base).contains("Exchange"))
      // ...and both paths compute the same 16 rows
      assert(spjRows == baseRows && spjRows.size == 16)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("LIMIT pushes fully into the scan: the interval truncates, one shard plans") {
    val df = gen(1000, 10).limit(37)
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 37L))
    val scan = batchScan(df)
    assert(scan.scan.description().contains("range=[0,37)"),
      s"limit must truncate the interval: ${scan.scan.description()}")
    assert(scan.inputPartitions.size == 1, "37 ids intersect exactly one 100-id shard")
  }

  test("ORDER BY id LIMIT pushes as a prefix/suffix interval; Spark keeps the final sort") {
    val asc = gen(1000, 10).orderBy(col("id")).limit(5)
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 5L))
    assert(batchScan(asc).scan.description().contains("range=[0,5)"))
    val desc = gen(1000, 10).orderBy(col("id").desc).limit(5)
    assert(desc.collect().map(_.getLong(0)).toSeq == (999L to 995L by -1L))
    assert(batchScan(desc).scan.description().contains("range=[995,1000)"),
      s"DESC top-n must keep the interval SUFFIX: ${batchScan(desc).scan.description()}")
    // top-n on a non-id column cannot push; results stay correct
    val byValue = gen(1000, 10).orderBy(col("value"), col("id")).limit(3)
    val want = (0L until 1000L).map(i => (NativeExprs.mix64(i) >>> 16 & 0xffffL, i))
      .sorted.take(3).map(_._2)
    assert(byValue.collect().map(_.getLong(0)).toSeq == want)
    assert(batchScan(byValue).scan.description().contains("range=[0,1000)"))
  }

  test("OFFSET pushes fully: the interval drops its prefix; LIMIT+OFFSET compose") {
    val off = gen(1000, 10).offset(990)
    assert(off.collect().map(_.getLong(0)).sorted.toSeq == (990L until 1000L))
    assert(batchScan(off).scan.description().contains("range=[990,1000)"),
      s"offset must drop the prefix: ${batchScan(off).scan.description()}")
    // LIMIT 5 OFFSET 10 via SQL: rows 10..14, one shard planned
    gen(1000, 10).createOrReplaceTempView("gen_offset_v")
    val page = spark.sql("SELECT id FROM gen_offset_v LIMIT 5 OFFSET 10")
    assert(page.collect().map(_.getLong(0)).sorted.toSeq == (10L until 15L))
    assert(batchScan(page).scan.description().contains("range=[10,15)"),
      s"paging must push both bounds: ${batchScan(page).scan.description()}")
  }

  private def aggGen(rows: Long, pushdown: Boolean) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("slices", "8")
      .option("aggPushdown", pushdown.toString).load()

  test("aggregate pushdown: scan emits group partials, Spark merges, rows identical") {
    def pipeline(pushdown: Boolean) =
      aggGen(4000, pushdown)
        .filter(col("id") < 3000L)
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          min(col("value")).as("mv"), max(col("id")).as("mx"))
        .orderBy(col("category"))
    val pushed = pipeline(pushdown = true)
    val got = pushed.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = pipeline(pushdown = false).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want && got.size == 16)
    val scan = batchScan(pushed)
    assert(scan.scan.description().contains("PushedAggregates=[COUNT(*),SUM(value),MIN(value),MAX(id)]"),
      s"scan must carry the pushed aggregates: ${scan.scan.description()}")
    assert(scan.scan.description().contains("PushedGroupBy=[category]"))
    // the scan's output schema IS the aggregation schema: grouping col first
    val schema = scan.scan.readSchema().fieldNames.toSeq
    assert(schema.head == "category" && schema.size == 5, s"agg scan schema: $schema")
    // row economics: ≤16 partial rows per task instead of 3000 base rows
    val partials = scan.metrics("numOutputRows").value
    assert(partials <= 16L * scan.inputPartitions.size && partials >= 16L,
      s"scan emitted $partials rows over ${scan.inputPartitions.size} tasks")
  }

  test("aggregate pushdown: global (ungrouped) partials and empty intervals") {
    def agg(pushdown: Boolean, cap: Long) =
      aggGen(2000, pushdown).filter(col("id") < cap)
        .agg(count(lit(1)).as("n"), min(col("value")).as("mv"), max(col("value")).as("mx"))
    for (cap <- Seq(2000L, 700L, 0L)) {
      val p = agg(pushdown = true, cap).collect().head
      val b = agg(pushdown = false, cap).collect().head
      assert(p == b, s"cap=$cap pushed=$p base=$b")
    }
    // empty interval: zero partial rows, final agg reconstitutes count=0 + null min/max
    val empty = agg(pushdown = true, 0L).collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
    val scanned = agg(pushdown = true, 2000L)
    scanned.collect()
    assert(batchScan(scanned).scan.description().contains("PushedAggregates=[COUNT(*),MIN(value),MAX(value)]"))
  }

  test("runtime v2 filtering: a DPP join prunes key-grouped category partitions") {
    val fact = spark.read.format("graftgen")
      .option("rows", "4000").option("keyGrouped", "true").load()
    // the selective predicate must be on a NON-join-key column: a filter
    // on `category` itself would be statically inferred onto the fact
    // side (constraint propagation) and leave nothing to prune at
    // runtime. k=34 → category 2, k=57 → category 9 — knowable only by
    // executing the dim.
    val dim = spark.range(0, 160)
      .select((col("id") % 16).cast("int").as("category"), col("id").as("k"))
      .filter(col("k") === 34 || col("k") === 57)
    val joined = fact.join(dim, Seq("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
      .orderBy(col("category"))
    val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // truth from the driver-side replay
    val byCat = (0L until 4000L).groupBy(i => ((NativeExprs.mix64(i) >>> 8) & 15L).toInt)
    assert(got == Seq(2, 9).map(c => (c, byCat(c).size.toLong)))
    val plan = finalPlanString(joined)
    assert(plan.contains("runtimeCategories=[2,9]"),
      s"scan must record the runtime-pruned categories:\n$plan")
  }

  test("columnar read path: ColumnarToRow in plan, content identical to row reads") {
    def colGen(columnar: Boolean) = spark.read.format("graftgen")
      .option("rows", "10000").option("slices", "3")
      .option("columnar", columnar.toString).load()
    val vec = colGen(columnar = true).filter(col("id") >= 100L)
    val got = vec.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val want = colGen(columnar = false).filter(col("id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq && got.length == 9900)
    val plan = vec.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"vectorized scan must enter the plan behind a ColumnarToRow bridge:\n$plan")
  }
}
