package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BloomPrune, Layout}

class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("layout-spec")

  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var c = v & 0xFFFFL
      c = (c | (c << 8)) & 0x00FF00FFL
      c = (c | (c << 4)) & 0x0F0F0F0FL
      c = (c | (c << 2)) & 0x33333333L
      (c | (c << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  test("zValue matches a bit-by-bit Morton reference and is injective on 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue($"x", $"y").as("z")).as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => mortonRef(x, y) })
    assert(pairs.distinct.size == pairs.map { case (x, y) => mortonRef(x, y) }.distinct.size)
  }

  test("quantize16 survives spans past Long.MaxValue/65535: row and planner sides agree, monotone") {
    import spark.implicits._
    // micro/nano-timestamp-scale keys: (v−lo)·65535 wraps Long here; a
    // wrapped product breaks Morton monotonicity, so the planner's
    // per-file z-intervals would stop bounding row z-values and curve
    // pruning could skip matching files
    val lo = -4000000000000000000L
    val hi = 4100000000000000003L // span > Long.MaxValue: even (v−lo) wraps
    val rnd = new scala.util.Random(11)
    val vs = (Seq(lo, lo + 1, -1L, 0L, 1L, hi - 1, hi) ++
      Seq.fill(200)(lo + (rnd.nextDouble() * 8.1e18).toLong)).distinct.sorted
    val scalar = vs.map(Layout.quantize16Long(_, lo, hi))
    assert(scalar.head == 0L && scalar.last == 65535L)
    assert(scalar.forall(q => q >= 0L && q <= 65535L), "wrapped products go negative")
    assert(scalar == scalar.sorted, "quantization must stay monotone on wide spans")
    val rows = vs.toDF("v")
      .select(Layout.quantize16($"v", lit(lo), lit(hi)).as("q"))
      .as[Long].collect().toSeq
    assert(rows == scalar,
      "row-side DECIMAL math and planner-side BigInt math must agree value-for-value")
    // and the narrow-span fast path is unchanged vs the exact formula
    val narrow = Seq(0L, 1L, 500L, 999L, 1000L)
    assert(narrow.map(Layout.quantize16Long(_, 0L, 1000L)) ==
      narrow.map(v => v * 65535L / 1000L))
  }

  test("zorderStats buckets tile the space with bounded rectangles") {
    import spark.implicits._
    val df = (0 until 8000).map(i => (i.toLong % 197, (i * 31L) % 83)).toDF("a", "b")
    val stats = Layout.zorderStats(df, "a", "b", bucketBits = 4).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 8000L)
    // each of the 16 z-space buckets covers at most half of each
    // quantized dim (top-2-bits-of-z split both dims once)
    stats.foreach { r =>
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 197 / 2 + 1)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 83 / 2 + 1)
    }
  }

  test("driver-side hilbertD2 mirrors the native expression value-for-value") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(call_function("graft_hilbert_d2", $"x", $"y").as("d"))
      .as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => Layout.hilbertD2(x, y) })
  }

  test("hilbertBucketsForBox covers exactly the data buckets intersecting the box") {
    // exhaustive over the full 16-bit grid SAMPLED on a lattice: every
    // sampled point inside the box must land in an eligible bucket,
    // and every eligible bucket must contain at least one box cell
    // corner — the planner can neither miss data nor over-read wildly.
    val (bx0, bx1, by0, by1) = (4000L, 20000L, 9000L, 17000L)
    val elig = Layout.hilbertBucketsForBox(bx0, bx1, by0, by1, levels = 3).toSet
    assert(elig.size == 6) // 3x2 grid cells at level 3
    for (x <- bx0 to bx1 by 997; y <- by0 to by1 by 499) {
      val b = Layout.hilbertD2(x, y) >>> 26
      assert(elig.contains(b), s"in-box point ($x,$y) in unplanned bucket $b")
    }
  }

  test("curve-range coalescing: cover == cell list at every level, ranges << cells when fine") {
    val (bx0, bx1, by0, by1) = (4000L, 20000L, 9000L, 17000L)
    for (levels <- Seq(3, 6, 8)) {
      val cells = Layout.hilbertBucketsForBox(bx0, bx1, by0, by1, levels)
      val ranges = Layout.hilbertRangesForBox(bx0, bx1, by0, by1, levels)
      // exact cover: expanding the ranges reproduces the cell list —
      // range pruning reads the SAME buckets, so identical rows
      assert(ranges.flatMap { case (lo, hi) => lo to hi } == cells,
        s"levels=$levels: range cover diverges from the cell list")
      // ranges are maximal (no two adjacent ranges touch)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ =>
      }
    }
    // the scale point: at level 8 the box spans thousands of cells but
    // Hilbert contiguity collapses them to ~perimeter-many runs
    val cells8 = Layout.hilbertBucketsForBox(bx0, bx1, by0, by1, levels = 8)
    val ranges8 = Layout.hilbertRangesForBox(bx0, bx1, by0, by1, levels = 8)
    assert(cells8.size > 1000, s"expected a dense fine-level box, got ${cells8.size}")
    assert(ranges8.size * 4 < cells8.size,
      s"coalescing too weak: ${ranges8.size} ranges for ${cells8.size} cells")
  }

  test("quadtree curve-range planning covers fine levels without cell enumeration") {
    val (bx0, bx1, by0, by1) = (4000L, 20000L, 9000L, 17000L)
    // level 12: cell side 16 — the box spans ~10^6 cells; the planner
    // must cover them all while emitting only perimeter-many ranges
    val ranges = Layout.hilbertRangesForBox(bx0, bx1, by0, by1, levels = 12)
    val cells = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(cells > 400000, s"cover too small: $cells cells")
    assert(ranges.size < 5000, s"coalescing failed: ${ranges.size} ranges")
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, "ranges not maximal")
      case _ =>
    }
    def cellOf(x: Long, y: Long) = Layout.hilbertD2(x, y) >>> 8
    def covered(d: Long) = ranges.exists { case (lo, hi) => d >= lo && d <= hi }
    // membership: every sampled in-box point's cell is covered…
    for (x <- bx0 to bx1 by 1499; y <- by0 to by1 by 733)
      assert(covered(cellOf(x, y)), s"in-box point ($x,$y) uncovered")
    // …and points a full cell-side outside the box are not
    for ((x, y) <- Seq((bx0 - 32, by0 - 32), (bx1 + 32, by1 + 32),
        (100L, 60000L), (60000L, 100L)))
      assert(!covered(cellOf(x, y)), s"outside point ($x,$y) covered")
  }

  test("z03: executed scan reads files_read files, < 1/3 of total; layout never changes answers") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val out = graft.queries.LayoutQueries.z03(spark, sfDir).collect()
    val filesTotal = out.head.getAs[Long]("files_total")
    val filesRead = out.head.getAs[Long]("files_read")
    assert(filesRead == out.length.toLong) // one output row per read bucket
    assert(filesRead * 3 < filesTotal,
      s"pruning too weak: read $filesRead of $filesTotal")
    // the EXECUTED plan touched exactly files_read parquet files: count
    // part-files via the scan's selected partitions, not inputFiles
    // (which ignores partition pruning)
    val (bx0, bx1, by0, by1) = (4000L, 20000L, 9000L, 17000L)
    val eligible = Layout.hilbertBucketsForBox(bx0, bx1, by0, by1, levels = 3)
    val root = graft.queries.LayoutQueries.z03Root(sfDir)
    val pruned = spark.read.parquet(root).filter($"bucket".isin(eligible: _*))
    pruned.collect() // collect() runs the dataset's OWN QueryExecution, so
    // the scan metrics below belong to the executed plan (count() would
    // build and execute a separate aggregate plan, leaving these at 0)
    val scans = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles == filesRead,
      s"scan touched $numFiles files, planner said $filesRead")
    // on-disk file census: one file per bucket dir, files_total dirs
    val partFiles = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(d => d.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(partFiles.length.toLong == filesTotal)
    assert(partFiles.forall(_ == 1), "expected exactly one file per bucket dir")
    // layout invariance: in-box rows equal a straight unclustered scan
    val straight = spark.read.parquet(root) // full scan, no bucket pruning
      .filter($"qx".between(bx0, bx1) && $"qy".between(by0, by1)).count()
    assert(out.map(_.getAs[Long]("n_rows_box")).sum == straight)
  }

  test("bloom prune: zero false negatives, any partitioning") {
    import spark.implicits._
    val dim = (0 until 400).map(i => i * 7L).toDF("key")
    val fact = (0 until 20000).map(_.toLong).toDF("key")
    val bloom = BloomPrune.build(dim, "key")
    val passed = BloomPrune.prune(fact, "key", bloom).as[Long].collect().toSet
    // every true member passes (Bloom's one-sided guarantee)
    val members = (0 until 400).map(i => i * 7L).filter(_ < 20000).toSet
    assert(members.subsetOf(passed))
    // pruning actually prunes: survivors are a small superset
    assert(passed.size < members.size + 100,
      s"fp explosion: ${passed.size - members.size} false positives")
  }
}
