package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CountMin, Frequency, Hll}

class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("sketches-spec")

  test("HLL estimate lands inside the standard error envelope") {
    import spark.implicits._
    // m=256 → σ ≈ 1.04/√256 = 6.5%; assert 4σ on three cardinalities.
    // All n ≥ 2.5m = 640: below that the RAW estimator is biased high by
    // design (the omitted linear-counting correction's domain — see the
    // Hll scaladoc for why corrections stay out).
    for (n <- Seq(1000L, 5000L, 200000L)) {
      val df = spark.range(n).select(lit("g").as("grp"), $"id")
      val est = Hll.estimate(Hll.registers(df, $"id", Seq($"grp")), Seq($"grp"))
        .head.getAs[Double]("hll_estimate")
      val relErr = math.abs(est - n) / n.toDouble
      assert(relErr < 0.26, s"n=$n est=$est relErr=$relErr exceeds 4σ")
    }
  }

  test("HLL registers: rho semantics match Long.numberOfLeadingZeros") {
    import spark.implicits._
    // recompute rho on the driver for a sample of keys and compare with
    // the conv()-string form the operator uses
    val keys = Seq(0L, 1L, 42L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = Hll.registers(keys.toDF("id"), $"id", Seq(lit(1).as("g")))
      .select($"j", $"rho_max").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val want = keys.map { k =>
      val h = graft.functions.NativeExprs.mix64(k)
      val j = h >>> 56
      val low = h & ((1L << 56) - 1)
      val rho = if (low == 0L) 57 else java.lang.Long.numberOfLeadingZeros(low) - 8 + 1
      (j, rho)
    }.groupBy(_._1).map { case (j, v) => j -> v.map(_._2).max }
    assert(got == want)
  }

  test("histogram quantile brackets contain the exact percentiles") {
    // h02's guarantee: the true quantile (q33's exact value) lies inside
    // every returned [p_lo, p_hi] bracket, and brackets are bin-narrow
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val exact = graft.queries.Relational.q33Percentiles(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      graft.queries.SketchQueries.h02(spark, dir).collect().foreach { r =>
        val e = exact(r.getString(0))
        for (p <- Seq(50, 90, 99)) {
          val lo = r.getAs[Double](s"p${p}_lo"); val hi = r.getAs[Double](s"p${p}_hi")
          val ex = e.getAs[Double](s"p${p}_price")
          assert(lo <= ex && ex <= hi,
            s"${r.getString(0)} p$p: exact $ex outside bracket [$lo, $hi]")
          assert(hi - lo < 150.0, s"bracket too wide: [$lo, $hi]") // ~domain/1024
        }
      }
    }
  }

  test("KMV windowed distinct: estimate inside the k-envelope of q63's exact counts") {
    // q68's sketch estimate vs q63's exact windowed distinct, joined on
    // (prio, day): a merged sketch below k IS exact (bit-equal), and at
    // ≥ k the estimate must sit within 4σ ≈ 4/√(k−2) ≈ 25% of exact.
    // sf0.01's windows never reach k=256 distinct customers (every row
    // exercises only the exact branch); sf0.1 saturates nearly every
    // window, so that's where the estimator envelope is actually tested.
    // only sf0.1 saturates k — without it the envelope is untestable,
    // so skip (not fail) on hosts lacking that testdata
    assume(new java.io.File("/root/testdata/sf0.1").isDirectory)
    var sketched = 0
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val exact = graft.queries.Relational.q63WindowedDistinct(spark, dir)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
      val rows = graft.queries.SketchQueries.q68(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val ex = exact((r.getString(0), r.getInt(1)))
        val nSk = r.getLong(3); val est = r.getDouble(4)
        if (nSk < graft.operators.Kmv.K)
          assert(est == ex.toDouble, s"sub-k sketch not exact: $r vs $ex")
        else {
          sketched += 1
          val relErr = math.abs(est - ex) / ex.toDouble
          assert(relErr < 0.26, s"$r: exact $ex relErr $relErr exceeds 4σ")
        }
      }
    }
    assert(sketched > 0, "no window ever saturated k — envelope untested")
  }

  test("heavy hitters: exact result, planted skew, partition-invariant") {
    import spark.implicits._
    // 10k rows: "hot" 600× (6%), "warm" 80× (0.8%), rest unique fillers
    val rows = Seq.fill(600)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 9320).map(i => s"u$i")
    val expect = Seq(("hot", 600L, 10000L), ("warm", 80L, 10000L))
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("item")
      val got = Frequency.heavyHitters(df, "item", 200) // threshold: >50 occurrences
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("histogram quantiles: degenerate spans keep brackets well-formed") {
    import spark.implicits._
    // constant group (span 1 < bins) and a 3-value group (span 3):
    // adjacent binLo values collide — brackets must not invert
    val df = (Seq.fill(100)(("c", 7L)) ++
      (0 until 90).map(i => ("t", (i % 3).toLong))).toDF("g", "m")
    val r = Hll.histogramQuantiles(df, Seq($"g"), $"m", bins = 1024,
        pcts = Seq(50, 99)).collect()
      .map(row => row.getString(0) -> row).toMap
    for ((g, exact) <- Seq("c" -> Map(50 -> 7L, 99 -> 7L),
                           "t" -> Map(50 -> 1L, 99 -> 2L));
         (p, ex) <- exact) {
      val lo = r(g).getAs[Long](s"p${p}_lo"); val hi = r(g).getAs[Long](s"p${p}_hi")
      assert(lo <= hi, s"$g p$p inverted bracket [$lo, $hi]")
      assert(lo <= ex && ex <= hi, s"$g p$p: exact $ex outside [$lo, $hi]")
    }
    // selection path agrees on the same degenerate inputs
    val sel = Hll.exactPercentilesSelect(df, Seq($"g"), $"m", bins = 1024,
        pcts = Seq(50, 99)).collect()
      .map(row => row.getString(0) -> row).toMap
    assert(sel("c").getAs[Long]("p50") == 7L && sel("c").getAs[Long]("p99") == 7L)
    assert(sel("t").getAs[Long]("p50") == 1L && sel("t").getAs[Long]("p99") == 2L)
  }

  test("count-min: estimates are one-sided (never below truth) and collision-bounded") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    // zipf-ish: item i appears ~3000/i times, 200 distinct items
    val rows = (1 to 200).flatMap(i => Seq.fill(3000 / i)(s"item_$i"))
    val items = rows.toDF("item")
    val counters = CountMin.build(items, "item")
    val exact = items.groupBy($"item").agg(count(lit(1)).as("cnt"))
    val est = CountMin.estimate(exact.select($"item"), "item", counters)
    val joined = exact.join(est, Seq("item"))
      .select($"item", $"cnt", $"cms_est").collect()
    assert(joined.length == 200)
    joined.foreach { r =>
      val (cnt, e) = (r.getLong(1), r.getLong(2))
      assert(e >= cnt, s"${r.getString(0)}: est $e below truth $cnt")
      // ε·N bound with huge slack: width 1024, N≈17.6k → collisions rare
      assert(e - cnt <= rows.size / 64, s"${r.getString(0)}: overcount ${e - cnt}")
    }
  }

  test("fuzzy join: deletion-neighborhood blocking is complete vs brute-force lev-1") {
    import spark.implicits._
    // 300 base words + planted typos of every edit kind: substitution
    // (first/middle/last char), deletion, insertion
    val base = (0 until 300).map(i => f"word${i}%03dtail")
    val typos = Seq(
      base(0).updated(0, 'x'), base(1).updated(5, 'x'),
      base(2).dropRight(1), base(3) + "z",
      base(4).patch(3, "q", 0))
    val vocab = (base ++ typos).zipWithIndex
      .map { case (t, i) => (t, i.toLong) }.toDF("token", "cnt")
    val got = graft.operators.FuzzyJoin.lev1Pairs(vocab)
      .select($"token_a", $"token_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // brute force on the driver
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = (base ++ typos).distinct
    val want = (for {
      a <- all; b <- all if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.size >= 5, "every planted typo kind must produce a pair")
  }

  test("heavy hitters: ties and threshold boundary are exact") {
    import spark.implicits._
    // n=1000, k=100 → keep cnt·100 > 1000 ⇔ cnt ≥ 11; plant cnt=10 (out),
    // cnt=11 (in), and two tied at 20 (order by cnt desc then item asc)
    val rows = Seq.fill(10)("edge10") ++ Seq.fill(11)("edge11") ++
      Seq.fill(20)("tie_b") ++ Seq.fill(20)("tie_a") ++
      (0 until 939).map(i => s"u$i")
    val got = Frequency.heavyHitters(rows.toDF("item"), "item", 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("tie_a", 20L), ("tie_b", 20L), ("edge11", 11L)))
  }
}
