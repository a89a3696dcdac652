package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frequency, Hll}

/** Scale smoke: the sketch operators on 10^7-row inputs (…two orders
  * of magnitude past the parquet testdata) with ANALYTICALLY known
  * answers — evidence the shapes hold as row counts grow, not just on
  * 60k-row fixtures. Kept to a few aggregate-only jobs so the suite
  * stays fast.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("scale-smoke-spec")

  test("HLL at 10M distinct keys stays inside 4 sigma") {
    import spark.implicits._
    val n = 10000000L
    val est = Hll.estimate(
        Hll.registers(spark.range(n).select(lit("g").as("g"), $"id"),
          $"id", Seq($"g")), Seq($"g"))
      .head.getAs[Double]("hll_estimate")
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 0.26, s"est=$est relErr=$relErr")
  }

  test("heavy hitters at 5M rows: exact answer on a known skew") {
    import spark.implicits._
    // item = id % 1000, except 10% of rows collapse onto item "hot":
    // hot has ~500k of 5M rows (10%), everything else ~0.09% < 1/k
    val n = 5000000L
    val items = spark.range(n).select(
      when($"id" % 10 === 0, lit("hot"))
        .otherwise(concat(lit("u"), ($"id" % 1000).cast("string"))).as("item"))
    val got = Frequency.heavyHitters(items, "item", 200)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == Seq("hot"))
    assert(got.head._2 == n / 10)
  }

  test("stratified sampling at 10M rows: exact quarter of every stratum, no giant sort") {
    import spark.implicits._
    // 4 strata of 2.5M rows each: ceil(n/4) = 625000 kept per stratum,
    // ranks dense 1..keepN — the bucketed selection must deliver the
    // exact count without ever sorting a whole stratum
    val n = 10000000L
    val df = spark.range(n).select($"id".as("doc_id"),
      concat(lit("s"), ($"id" % 4).cast("string")).as("lang"))
    val got = graft.operators.Sampling.stratifiedExact(df, "lang", "doc_id", 1, 4)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"), max($"sample_rank").as("max_rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val keep = 625000
    assert(got == (0 until 4).map(i => (s"s$i", keep.toLong, keep)).toSet)
  }

  test("PPS sampling at 10M equal-weight rows: every pick lands, one per boundary") {
    import spark.implicits._
    // equal weights ⇒ total = n·w, step = n·w/nPicks: exactly nPicks
    // picks, pick_k dense 1..nPicks (no row can straddle two boundaries)
    val n = 10000000L
    val df = spark.range(n).select($"id".as("doc_id"), lit(7L).as("w"))
    val picks = graft.operators.Sampling.weightedSystematic(df, "doc_id", "w", 100)
      .select($"pick_k").collect().map(_.getLong(0)).sorted.toSeq
    assert(picks == (1L to 100L))
  }

  test("SemDeDup derived k bounds the within-cluster pair scan as n grows") {
    import spark.implicits._
    import graft.operators.Similarity
    graft.functions.NativeExprs.ensureRegistered(spark)
    // the rule itself is pure: k ∝ n (10M → 78125 clusters, never 8)
    assert(Similarity.semdedupK(1000L) == 8)
    assert(Similarity.semdedupK(100000L) == 782)
    assert(Similarity.semdedupK(10000000L) == 78125)
    // 100k hash-uniform fixed vectors through the REAL e02 clustering
    // path (same trainer + assignment); the quadratic-killer assertion
    // is on Σ cᵢ² — the exact number of within-cluster pairs scanned
    val n = 100000L
    val cand = spark.range(n).select($"id".as("cand_id"),
        transform(sequence(lit(0), lit(7)),
          d => ($"id" * 2654435761L + d.cast("long") * 40503L) % 1000L - 500L)
          .as("cv"))
      .withColumn("cn", Similarity.normSqFixed($"cv"))
      .persist()
    val k = Similarity.semdedupK(n)
    val cents = Similarity.kmeansCentroidsFixed(cand, k, iters = 1)
    val agg = cand.crossJoin(broadcast(cents))
      .withColumn("c_cos", Similarity.cosineFromFixed(
        Similarity.dotFixed($"cv", $"centv"), $"cn", $"centn"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"cand_id")
          .orderBy($"c_cos".desc, $"centroid_id")))
      .filter($"r" === 1)
      .groupBy($"centroid_id").agg(count(lit(1)).as("c"))
      .agg(sum($"c").as("n"), sum($"c" * $"c").as("pair_work")).head()
    cand.unpersist()
    assert(agg.getLong(0) == n) // every vector assigned exactly once
    // Σ cᵢ² ≤ n · 32·target: a FIXED k = 8 would give Σ cᵢ² ≈ n²/8 =
    // n · 12500, three times past this bound — derived k keeps the
    // pair scan linear in n at constant target cluster size
    assert(agg.getLong(1) <= n * 32 * 128, s"pair work ${agg.getLong(1)}")
  }

  test("KMV at 10M distinct keys stays inside the envelope; union sketch merges cheaply") {
    import spark.implicits._
    import graft.operators.Kmv
    val n = 10000000L
    val sk = Kmv.sketch(spark.range(n).select($"id".as("key")), "key", 256)
    val est = sk.agg(max($"uh").as("uh"))
      .select(Kmv.estimate($"uh", lit(n), 256).as("e")).head.getDouble(0)
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 0.26, s"est=$est relErr=$relErr") // 4σ at σ≈1/√254
    // union with a 50%-overlapping set: merge operates on ≤512 rows;
    // Kmv.merge dedups the shared keys' duplicate hashes first
    val other = Kmv.sketch(
      spark.range(n / 2, n + n / 2).select($"id".as("key")), "key", 256)
    val merged = Kmv.merge(sk, other, 256)
    val estU = merged.agg(max($"uh").as("uh"))
      .select(Kmv.estimate($"uh", lit(n + n / 2), 256).as("e")).head.getDouble(0)
    assert(math.abs(estU - 1.5 * n) / (1.5 * n) < 0.26, s"union est=$estU")
  }

  test("concat-chunk offsets at 5M uniform docs: analytic global layout, bucketed prefix sums") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 5M docs of exactly 7 tokens (+1 EOS = 8): total stream = 40M
    // tokens; every start offset is a multiple of 8 and the LAST doc's
    // end equals the analytic total — proof the 256-bucket prefix-sum
    // reconstruction is globally consistent without any full sort
    val n = 5000000L
    val d = spark.range(n).select($"id".as("doc_id"), lit(8L).as("n_tok"),
        md5($"id".cast("string").cast("binary")).as("h"))
      .withColumn("bkt", conv(substring($"h", 1, 2), 16, 10).cast("int"))
    val counts = d.groupBy($"bkt").agg(sum($"n_tok").as("bw"))
    val wPrefix = Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum($"bw").over(wPrefix), lit(0L)))
      .select($"bkt", $"off")
    val wBkt = Window.partitionBy($"bkt").orderBy($"h", $"doc_id")
    val ends = d.join(broadcast(offsets), Seq("bkt"))
      .withColumn("end_off", $"off" + sum($"n_tok").over(
        wBkt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = ends.agg(max($"end_off").as("mx"),
      sum(when($"end_off" % 8 === 0, 0L).otherwise(1L)).as("misaligned")).head
    assert(agg.getLong(0) == 8L * n)
    assert(agg.getLong(1) == 0L)
  }

  test("BFS at a 2M-edge graph: frontier costs stay per-level, distances analytic") {
    import spark.implicits._
    // ring of 1M nodes (2M directed edges): BFS from node 0 to depth 3
    // must discover exactly {0, ±1, ±2, ±3} — frontier work is the
    // 6-node edge cut, NOT the million-node graph, at every level
    val n = 1000000L
    val fwd = spark.range(n).select($"id".as("src"), (($"id" + 1) % n).as("dst"))
    val edges = fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst")))
    val got = graft.operators.Graph.bfsHops(edges, Seq(0L).toDF("id"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, (n - 1) -> 1, 2L -> 2, (n - 2) -> 2,
      3L -> 3, (n - 3) -> 3))
  }

  test("deep BFS (25 hops) on a 200k-edge ring: accumulated-visited frame stays flat") {
    import spark.implicits._
    // ring of 100k nodes, depth 25: per-level work must be the ~2-node
    // frontier plus ONE scan of the accumulated visited frame — the
    // round-6 shape re-scanned every prior level each round, O(V·depth)
    // on exactly this kind of deep graph. Distances are analytic:
    // hops(k) = min(k, n−k) capped at 25, so the result is precisely
    // {0} ∪ {±1..±25} with hops = |offset|.
    val n = 100000L
    val depth = 25
    val fwd = spark.range(n).select($"id".as("src"), (($"id" + 1) % n).as("dst"))
    val edges = fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst")))
    val got = graft.operators.Graph.bfsHops(edges, Seq(0L).toDF("id"), maxHops = depth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = (0 to depth).flatMap(h =>
      if (h == 0) Seq(0L -> 0) else Seq(h.toLong -> h, (n - h) -> h)).toMap
    assert(got == want)
  }

  test("weighted SSSP: 2M-edge background, work tracks the reachable set") {
    import spark.implicits._
    // Bellman-Ford must converge fully (unlike bfsHops there is no
    // depth cap), so scale pressure and convergence are split: a 2M-edge
    // ring component UNREACHABLE from the seed (every round's equi-join
    // probes the full edge frame, but the distance frame stays 5 rows —
    // the work-∝-reachable-labels claim), plus a planted component with
    // a guaranteed relaxation: 0→4 direct w=9 is labeled in round 1 and
    // IMPROVED to 7 via 0→2 (shortcut w=3) →3→4 discovered in round 3.
    val n = 1000000L
    val ring = spark.range(n).select(($"id" + 10).as("src"),
      ((($"id" + 1) % n) + 10).as("dst"), lit(1L).as("w"))
    val back = ring.unionByName(
      ring.select($"dst".as("src"), $"src".as("dst"), $"w"))
    val planted = Seq((0L, 1L, 2L), (1L, 2L, 2L), (2L, 3L, 2L), (3L, 4L, 2L),
      (0L, 2L, 3L), (0L, 4L, 9L)).toDF("src", "dst", "w")
    val got = graft.operators.Graph.ssspWeighted(
        back.unionByName(planted), Seq(0L).toDF("id"), maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 3L, 3L -> 5L, 4L -> 7L))
  }

  test("next-fit packing at 5M uniform docs: analytic bins, no driver materialization") {
    import spark.implicits._
    // equal 10-token docs, cap 100 → exactly 10 docs per bin; 8 shards
    // of 625k docs → 62500 bins each; every offset a multiple of 10.
    // All assertions are aggregates — nothing rows-sized hits the driver.
    val n = 5000000L
    val docs = spark.range(n).select($"id".as("doc_id"), lit(10L).as("n_tokens"))
    val packed = graft.operators.Packing.nextFitPack(docs, 100L, 8).toDF()
    val agg = packed.agg(
      count(lit(1)).as("n"),
      countDistinct($"shard", $"bin").as("n_bins"),
      max($"bin").as("max_bin"),
      sum(($"start_tok" % 10 =!= 0).cast("long")).as("bad_offsets")).head()
    assert(agg.getLong(0) == n)
    assert(agg.getLong(1) == n / 10) // 500k bins in total
    assert(agg.getLong(2) == n / 8 / 10 - 1) // 62499 per shard
    assert(agg.getLong(3) == 0L)
  }

  test("histogram quantile brackets at 10M rows contain the analytic percentiles") {
    import spark.implicits._
    // measure = id over 0..n-1: the k-th smallest is k-1, so the exact
    // percentile is ceil(p·n/100)−1 — check it falls inside each bracket
    val n = 10000000L
    val df = spark.range(n).select(lit("g").as("g"), $"id")
    val r = Hll.histogramQuantiles(df, Seq($"g"), $"id", bins = 1024,
      pcts = Seq(50, 90, 99)).head
    assert(r.getAs[Long]("n_items") == n)
    for (p <- Seq(50, 90, 99)) {
      val exact = (n * p + 99) / 100 - 1
      val lo = r.getAs[Long](s"p${p}_lo"); val hi = r.getAs[Long](s"p${p}_hi")
      assert(lo <= exact && exact <= hi, s"p$p: $exact outside [$lo, $hi]")
      assert(hi - lo <= n / 1024 + 1, s"p$p bracket too wide: [$lo, $hi]")
    }
  }

  test("BPE apply at a 32k-merge production vocabulary: one projection, analytic result") {
    import spark.implicits._
    // rank 1 = (a,a); ranks 2..32768 = (a^i, a) — a real vocab's size,
    // riding as two array literals into ONE BpeApplyExpr. Per-row cost
    // is O(L^2) hash probes, INDEPENDENT of table size; the round-7
    // fold would have built a 32k-deep expression tree here. The result
    // is analytic: on a^L, rank 1 pairs to ceil(L/2) tokens, then only
    // (a^i, a) rules can fire, each gluing one trailing single "a".
    val merges = (1 to 32768).map(i => ("a" * i, "a"))
    val words = Seq("a" * 5, "a" * 12, "ab" * 3).map(w => (w, 1L)).toDF("word", "freq")
    val got = graft.operators.Bpe.applyMerges(words, merges)
      .select($"word", $"s").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // a^5:  [aa,aa,a] -> rank2 (aa,a) fires on the LAST pair -> [aa,aaa]
    // a^12: [aa x6] -> no (a^i, a) rule matches (no single "a" left)
    // ababab: only rank 1 is applicable nowhere (no aa) -> char split
    assert(got("aaaaa") == Seq("aa", "aaa"))
    assert(got("aaaaaaaaaaaa") == Seq("aa", "aa", "aa", "aa", "aa", "aa"))
    assert(got("ababab") == Seq("a", "b", "a", "b", "a", "b"))
  }
}
