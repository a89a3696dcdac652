package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeExprs
import graft.operators.Kmv

/** [[graft.functions.KmvAggExpr]] — the sketch-as-aggregation-buffer
  * path. Pins (1) equality with the DataFrame-level [[Kmv.sketch]]
  * dataflow, (2) duplicate immunity (raw rows ≡ pre-distinct input),
  * (3) the two-phase ObjectHashAggregate plan (partial sketches fold
  * map-side; the shuffle carries buffers, not rows), (4) merge-path
  * correctness under adversarial partitioning, (5) sub-k exactness.
  */
class NativeAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("native-agg-spec")

  private def sketchOf(rows: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] = {
    NativeExprs.ensureRegistered(spark)
    rows.groupBy(col("g")).agg(Kmv.sketchAgg(Kmv.uhCol(col("k")), 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("aggregate sketch == Kmv.sketch dataflow, per group") {
    import spark.implicits._
    val rows = spark.range(20000)
      .select((($"id" % 7) < 3).cast("string").as("g"), ($"id" % 3001).as("k"))
      .localCheckpoint()
    val got = sketchOf(rows)
    for (g <- Seq("true", "false")) {
      val want = Kmv.sketch(rows.filter($"g" === g), "k", 256)
        .orderBy($"uh").select($"uh").as[Long].collect().toSeq
      assert(got(g) == want, s"group $g diverges from the dataflow sketch")
    }
  }

  test("duplicate rows cannot change the sketch (set semantics)") {
    import spark.implicits._
    val base = spark.range(5000).select(lit("g").as("g"), ($"id" % 900).as("k"))
    val dup = base.union(base).union(base.limit(1234))
    assert(sketchOf(base)("g") == sketchOf(dup)("g"))
    // and the sub-k shape: 900 distinct keys > 256 saturates; a narrow set is exact
    val tiny = spark.range(40).select(lit("g").as("g"), ($"id" % 17).as("k"))
    val sk = sketchOf(tiny)("g")
    assert(sk.size == 17 && sk == sk.sorted, "sub-k sketch must be the exact sorted hash set")
  }

  test("plans as two-phase ObjectHashAggregate (map-side sketch combine)") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    val df = spark.range(1000).select(($"id" % 5).as("g"), $"id".as("k"))
      .groupBy($"g").agg(Kmv.sketchAgg(Kmv.uhCol($"k"), 256).as("sk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val phases = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(phases >= 2, s"expected partial+final ObjectHashAggregate, plan:\n$plan")
    assert(plan.contains("graft_kmv_agg"), "aggregate must appear under its registered name")
  }

  test("merge path: result invariant under partitioning, and skewed merges early-break correctly") {
    import spark.implicits._
    val rows = spark.range(30000)
      .select(lit("g").as("g"), ($"id" % 4999).as("k")).localCheckpoint()
    val one = sketchOf(rows.repartition(1))
    val wide = sketchOf(rows.repartition(37))
    // adversarial: one partition holds only large hashes, another only small
    val sorted = rows.withColumn("uh", Kmv.uhCol($"k")).repartitionByRange(8, $"uh")
      .drop("uh")
    assert(one == wide && one == sketchOf(sorted))
    assert(one("g").size == 256)
  }

  test("HllAggExpr register table == declarative Hll.registers, any partitioning") {
    import spark.implicits._
    import graft.operators.Hll
    val rows = spark.range(40000)
      .select((($"id" % 3).cast("string")).as("g"), ($"id" % 7211).as("k"))
      .localCheckpoint()
    def table(df: org.apache.spark.sql.DataFrame,
        f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
            Seq[org.apache.spark.sql.Column]) => org.apache.spark.sql.DataFrame) =
      f(df, col("k"), Seq(col("g"))).collect()
        .map(r => (r.getString(0), r.getAs[Number]("j").longValue,
          r.getAs[Number]("rho_max").intValue)).sorted.toSeq
    val declarative = table(rows, Hll.registers)
    assert(table(rows, Hll.registersAgg) == declarative)
    assert(table(rows.repartition(37), Hll.registersAgg) == declarative)
    // and the full estimate chain lands on identical doubles
    val e1 = Hll.estimate(Hll.registers(rows, col("k"), Seq(col("g"))), Seq(col("g")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    val e2 = Hll.estimate(Hll.registersAgg(rows, col("k"), Seq(col("g"))), Seq(col("g")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    assert(e1 == e2)
  }

  test("degenerate inputs: empty frames, all-null keys, k=1") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    // global aggregate over zero rows: one row, empty sketch
    val empty = spark.range(0).select($"id".as("k"))
      .agg(Kmv.sketchAgg(Kmv.uhCol($"k"), 8)).head().getSeq[Long](0)
    assert(empty.isEmpty)
    // nulls never enter the sketch
    val withNulls = spark.range(100)
      .select(when($"id" % 2 === 0, $"id").as("k"))
    val sk = withNulls.agg(Kmv.sketchAgg(Kmv.uhCol($"k"), 256)).head().getSeq[Long](0)
    assert(sk.size == 50)
    // k=1 keeps exactly the global minimum hash
    val k1 = spark.range(1000).select($"id".as("k"))
      .agg(Kmv.sketchAgg(Kmv.uhCol($"k"), 1)).head().getSeq[Long](0)
    val minUh = (0L until 1000L)
      .map(x => graft.functions.NativeExprs.mix64(x) ^ Long.MinValue).min
    assert(k1 == Seq(minUh))
    // HLL: empty input yields the all-zero register array
    val regs = spark.range(0).select($"id".as("k"))
      .agg(call_function("graft_hll_agg", $"k")).head().getSeq[Int](0)
    assert(regs.size == 256 && regs.forall(_ == 0))
  }

  test("CmsAggExpr counter table == declarative CountMin.build, any partitioning") {
    import spark.implicits._
    import graft.operators.CountMin
    NativeExprs.ensureRegistered(spark)
    // multiplicities matter for CMS: id % k gives skewed token frequencies
    val items = spark.range(25000)
      .select(concat(lit("tok"), ($"id" % ($"id" % 97 + 1)) % 500).as("token"))
      .localCheckpoint()
    def table(df: org.apache.spark.sql.DataFrame,
        f: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame) =
      f(df, "token").collect()
        .map(r => (r.getAs[Number]("row").intValue, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val declarative = table(items, CountMin.build)
    assert(declarative.nonEmpty)
    assert(table(items, CountMin.buildAgg) == declarative)
    assert(table(items.repartition(37), CountMin.buildAgg) == declarative)
    // total mass per row == input row count (every occurrence hits each row once)
    val n = items.count()
    declarative.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == n)
    }
    // estimates from the aggregate-built counters stay one-sided
    val truth = items.groupBy($"token").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(truth.select($"token"), "token",
      CountMin.buildAgg(items, "token"))
    val joined = truth.join(est, Seq("token"))
      .select($"exact", $"cms_est").as[(Long, Long)].collect()
    assert(joined.nonEmpty && joined.forall { case (ex, e) => e >= ex })
  }

  test("CmsAggExpr plans as two-phase ObjectHashAggregate; empty input is the zero matrix") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    val df = spark.range(1000)
      .select(call_function("graft_hash64", concat(lit("t"), $"id" % 50)).as("_h"))
      .agg(call_function("graft_cms_agg", $"_h").as("cells"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, s"plan:\n$plan")
    assert(plan.contains("graft_cms_agg"))
    val zero = spark.range(0)
      .select(call_function("graft_hash64", $"id".cast("string")).as("_h"))
      .agg(call_function("graft_cms_agg", $"_h")).head().getSeq[Long](0)
    assert(zero.size == 3 * 1024 && zero.forall(_ == 0L))
  }

  test("HistAggExpr == declarative binning, any partitioning; clamps pin under/overflow") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    val (lo, hi, bins) = (100L, 1100L, 10)
    // values straddling both clamp edges, skewed across groups
    val rows = spark.range(4000)
      .select((($"id" % 3).cast("string")).as("g"),
        (($"id" * 37) % 1500 - 100).as("v"))
      .localCheckpoint()
    def native(df: org.apache.spark.sql.DataFrame): Map[(String, Int), Long] =
      df.groupBy($"g")
        .agg(call_function("graft_hist_agg", $"v", lit(lo), lit(hi), lit(bins)).as("h"))
        .select($"g", posexplode($"h").as(Seq("slot", "cnt")))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val declarative = rows
      .withColumn("slot",
        when($"v" < lo, 0).when($"v" >= hi, bins + 1)
          .otherwise((lit(1) + ($"v" - lo) * bins / (hi - lo)).cast("int")))
      .groupBy($"g", $"slot").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = native(rows)
    // native emits every slot; declarative only touched ones
    declarative.foreach { case (k, v) => assert(got(k) == v, s"slot $k") }
    assert(got.filterNot(e => declarative.contains(e._1)).values.forall(_ == 0L))
    assert(native(rows.repartition(37)) == got, "partitioning must not matter")
    // clamp slots are genuinely populated by this input
    assert(got.exists { case ((_, s), c) => s == 0 && c > 0 })
    assert(got.exists { case ((_, s), c) => s == bins + 1 && c > 0 })
    // plan shape: one two-phase ObjectHashAggregate
    val df = rows.groupBy($"g")
      .agg(call_function("graft_hist_agg", $"v", lit(lo), lit(hi), lit(bins)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2 &&
      plan.contains("graft_hist_agg"))
  }

  test("HistAggExpr degenerate inputs: empty, all-null, single-bin, everything clamped") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    def hist(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long, bins: Int): Seq[Long] =
      df.agg(call_function("graft_hist_agg", col("v"), lit(lo), lit(hi), lit(bins)))
        .head().getSeq[Long](0)
    // global aggregate over zero rows: the zero histogram, right arity
    assert(hist(spark.range(0).select($"id".as("v")), 0L, 100L, 4) == Seq.fill(6)(0L))
    // nulls never count
    val withNulls = spark.range(10).select(when($"id" % 2 === 0, $"id").as("v"))
    assert(hist(withNulls, 0L, 100L, 1).sum == 5L)
    // bins = 1: everything in [lo, hi) lands in the single bin
    assert(hist(spark.range(50).select($"id".as("v")), 0L, 50L, 1) == Seq(0L, 50L, 0L))
    // a range disjoint from the data: only the clamp slots populate
    assert(hist(spark.range(20).select(($"id" - 100L).as("v")), 0L, 10L, 3) ==
      Seq(20L, 0L, 0L, 0L, 0L))
    assert(hist(spark.range(20).select(($"id" + 100L).as("v")), 0L, 10L, 3) ==
      Seq(0L, 0L, 0L, 0L, 20L))
    // hi-1 is the last bin, hi itself overflows (half-open interval)
    assert(hist(Seq(9L, 10L).toDF("v"), 0L, 10L, 10) ==
      (Seq.fill(10)(0L) :+ 1L :+ 1L))
  }

  test("HistAggExpr wide ranges: hi-lo and off*bins past Long wrap stay exact") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    def hist(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long, bins: Int): Seq[Long] =
      df.agg(call_function("graft_hist_agg", col("v"), lit(lo), lit(hi), lit(bins)))
        .head().getSeq[Long](0)
    // full signed range: hi - lo wraps to -1 as a signed Long; every
    // value must land in a valid bin (never a negative slot)
    val extremes = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue - 1).toDF("v")
    assert(hist(extremes, Long.MinValue, Long.MaxValue, 4) ==
      Seq(0L, 1L, 1L, 2L, 1L, 0L))
    // mixed-sign range where off * bins overflows signed 64-bit:
    // off up to ~2^62, bins = 1024 -> product ~2^72
    val lo = -(1L << 61); val hi = 1L << 61
    val vals = Seq(lo, -1L, 0L, hi - 1).toDF("v")
    val got = hist(vals, lo, hi, 1024)
    assert(got.sum == 4L && got.head == 0L && got.last == 0L)
    assert(got(1) == 1L && got(512) == 1L && got(513) == 1L && got(1024) == 1L,
      s"exact bin placement under 128-bit arithmetic, got nonzero at " +
        got.zipWithIndex.filter(_._1 > 0).map(_._2).mkString(","))
  }

  test("estimate derived from the aggregate sketch tracks truth inside 4 sigma") {
    import spark.implicits._
    NativeExprs.ensureRegistered(spark)
    for (n <- Seq(1000L, 50000L)) {
      val est = spark.range(n).select(lit("g").as("g"), $"id".as("k"))
        .groupBy($"g").agg(Kmv.sketchAgg(Kmv.uhCol($"k"), 256).as("sk"))
        .select(Kmv.estimate(element_at($"sk", -1), size($"sk").cast("long"), 256))
        .as[Double].head()
      val relErr = math.abs(est - n) / n.toDouble
      assert(relErr < 0.26, s"n=$n est=$est relErr=$relErr exceeds 4 sigma (sigma~6.3%)")
    }
  }
}
