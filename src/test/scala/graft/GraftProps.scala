package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.gf
import graft.operators.WindowOps

/** ScalaCheck properties for the tricky operators (SURVEY.md §7.4):
  * gaps-and-islands streaks vs a reference implementation, NTILE bucket
  * balance, moving-average frame semantics, and the fixed-point /
  * rounding kernel.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  lazy val spark: SparkSession = GraftSession.local("props")

  /** Reference streaks: lengths of maximal strictly-increasing runs of
    * length ≥ 2, as (streak_len, start_index_of_first_improved).
    */
  private def refStreaks(values: List[Int]): List[(Long, Int)] = {
    val improved = values.zipWithIndex.drop(1).map { case (v, i) => (v > values(i - 1), i) }
    val runs = scala.collection.mutable.ListBuffer[(Long, Int)]()
    var len = 0L
    var start = -1
    improved.foreach { case (imp, i) =>
      if (imp) { if (len == 0) start = i; len += 1 }
      else if (len > 0) { runs += ((len, start)); len = 0 }
    }
    if (len > 0) runs += ((len, start))
    runs.toList
  }

  property("growthStreaks matches reference run-length semantics") =
    forAll(Gen.listOfN(10, Gen.choose(0, 5))) { values =>
      import spark.implicits._
      val df = values.zipWithIndex.map { case (v, i) => ("e", i, v) }.toDF("e", "t", "v")
      val got = WindowOps.growthStreaks(df, Seq(col("e")), col("t"), col("v"))
        .collect().map(r => (r.getAs[Long]("streak_len"), r.getAs[Int]("streak_start")))
        .sortBy(_._2).toList
      got == refStreaks(values)
    }

  property("ntile(4) bucket sizes differ by at most 1") =
    forAll(Gen.choose(1, 30)) { n =>
      import spark.implicits._
      val df = (1 to n).map(i => (i, i * 37 % 101)).toDF("id", "v")
      val sizes = df.withColumn("q",
          ntile(4).over(Window.orderBy(col("v").desc, col("id"))))
        .groupBy("q").count().collect().map(_.getLong(1))
      sizes.max - sizes.min <= 1
    }

  property("movingMeanFixed equals mean of the last <=k rows") =
    forAll(Gen.listOfN(12, Gen.choose(0L, 10000L)), Gen.choose(2, 5)) { (cents, k) =>
      import spark.implicits._
      val df = cents.zipWithIndex.map { case (c, i) => ("e", i, c) }.toDF("e", "t", "vf")
      val got = df.withColumn("m",
          WindowOps.movingMeanFixed(col("vf"), Seq(col("e")), Seq(col("t")), k, 100.0))
        .orderBy("t").collect().map(_.getAs[Double]("m"))
      val exp = cents.indices.map { i =>
        val frame = cents.slice(math.max(0, i - k + 1), i + 1)
        frame.sum.toDouble / frame.size / 100.0
      }
      got.toSeq == exp
    }

  property("dround is scaled-binary rounding and idempotent") =
    forAll(Gen.choose(-1e6, 1e6), Gen.choose(0, 4)) { (x, n) =>
      import spark.implicits._
      val Seq(r1, r2) = Seq(x).toDF("x")
        .select(gf.dround(col("x"), n).as("a"),
          gf.dround(gf.dround(col("x"), n), n).as("b"))
        .collect().flatMap(r => Seq(r.getDouble(0), r.getDouble(1))).toSeq
      val s = math.pow(10, n)
      val exp = math.signum(x) * math.floor(math.abs(x) * s + 0.5d) / s
      r1 == exp && r2 == r1
    }

  property("asOf join matches reference nearest-past semantics") =
    forAll(Gen.listOfN(8, Gen.choose(0, 100)), Gen.listOfN(5, Gen.choose(0, 100))) {
      (leftTimes, rightTimes) =>
        import spark.implicits._
        val left = leftTimes.distinct.zipWithIndex.map { case (t, i) => (i.toLong, 1L, t) }
        val right = rightTimes.distinct.map(t => (1L, t, s"p$t"))
        val l = left.toDF("id", "k", "t")
        val r = right.toDF("k", "rt", "payload")
        val got = graft.operators.AsOfJoin.asOf(l, r, "k", "t", "rt", Seq("payload"))
          .collect().map(x => x.getLong(0) -> Option(x.getAs[String]("asof_payload"))).toMap
        val expected = left.map { case (id, _, t) =>
          id -> right.filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
        }.toMap
        got == expected
    }

  property("exact dedup keeps exactly min-id survivor per fingerprint") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0, 5)))) { rows =>
      import spark.implicits._
      val distinctRows = rows.distinct // (id, groupKey); ids unique per group
      val df = distinctRows.map { case (id, g) => (id, s"g$g") }.distinct.toDF("id", "fp")
      val got = graft.operators.Dedup.exact(df, col("id"), col("fp"))
        .collect().map(r => (r.getAs[String]("fp"), r.getAs[Long]("id"),
          r.getAs[Long]("dup_group_size"))).toSet
      val expected = distinctRows.map { case (id, g) => (s"g$g", id) }.distinct
        .groupBy(_._1).map { case (fp, xs) =>
          (fp, xs.map(_._2).min, xs.map(_._2).distinct.size.toLong)
        }.toSet
      got == expected
    }

  property("native word count equals reference set-membership count") =
    forAll(
      Gen.listOfN(12, Gen.oneOf("the", "cat", "und", "der", "a", "zz", "", "la")),
      Gen.atLeastOne("the", "und", "la", "a", "missing")) { (toks, words) =>
      import spark.implicits._
      val wordSeq = words.toSeq
      val got = Seq(toks).toDF("toks")
        .select(graft.operators.TextOps.wordSetCount(col("toks"), wordSeq))
        .head.getInt(0)
      got == toks.count(wordSeq.contains(_))
    }

  property("fixed-point mean is exact for 2-decimal inputs") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 99999))) { centsInts =>
      import spark.implicits._
      val doubles = centsInts.map(_ / 100.0)
      val df = doubles.toDF("v")
      val got = df.agg(
        gf.meanFromFixed(sum(gf.fixed(col("v"), 100.0)), count(lit(1)), 100.0)).head.getDouble(0)
      val exp = centsInts.map(_.toLong).sum.toDouble / centsInts.size / 100.0
      got == exp
    }

  property("stratified sampling keeps exactly ceil(n·num/den) per stratum, ranks dense") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 2)), Gen.choose(1, 4)) { (strata, num) =>
      import spark.implicits._
      val df = strata.zipWithIndex
        .map { case (s, i) => (i.toLong, s"s$s") }.toDF("doc_id", "lang")
      val got = graft.operators.Sampling.stratifiedExact(df, "lang", "doc_id", num, 4)
        .collect().map(r => (r.getString(1), r.getInt(2)))
      val bySt = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val sizes = strata.groupBy(s => s"s$s").view.mapValues(_.size).toMap
      sizes.forall { case (s, n) =>
        val keep = (n * num + 3) / 4
        bySt.getOrElse(s, Seq.empty) == (1 to keep)
      }
    }

  property("PPS picks: multiplicity is div-exact in weight over step, total = nPicks") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 50L)), Gen.choose(1, 10)) { (ws, k) =>
      import spark.implicits._
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w")
      val picks = graft.operators.Sampling.weightedSystematic(df, "doc_id", "w", k)
        .collect().map(_.getLong(0))
      val total = ws.sum
      val step = math.max(total / k, 1L)
      // boundaries step, 2·step, …, k·step ≤ total each land exactly once
      val expected = (1L to k.toLong).count(_ * step <= total)
      picks.length == expected && picks.distinct.length == picks.length
    }

  property("funnel chain times are strictly increasing and stage-minimal") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 40L)))) { evs =>
      import spark.implicits._
      import java.sql.Timestamp
      val names = Seq("a", "b", "c")
      val df = evs.map { case (k, t) =>
        (1L, new Timestamp(t * 1000L), names(k)) }.toDF("user_id", "ts", "event_type")
      val row = graft.operators.Funnel
        .stages(df, "user_id", "ts", "event_type", names).collect()
      // reference: greedy strictly-after chain over the sorted event list
      def chain(prev: Long, k: Int, acc: List[Long]): List[Long] =
        if (k >= names.length) acc.reverse
        else evs.collect { case (s, t) if s == k && t * 1000L > prev => t * 1000L }
          .minOption match {
          case Some(t) => chain(t, k + 1, t :: acc)
          case None => acc.reverse
        }
      val expect = chain(Long.MinValue, 0, Nil)
      if (expect.isEmpty) row.isEmpty
      else {
        val got = (1 to names.length).map(i => Option(row.head.getTimestamp(i)))
          .takeWhile(_.isDefined).flatten.map(_.getTime).toList
        got == expect
      }
    }

  property("next-fit packing equals the sequential reference per shard") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 160L)), Gen.choose(1, 4)) { (lens, shards) =>
      import spark.implicits._
      val cap = 100L
      val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("doc_id", "n_tokens")
      val got = graft.operators.Packing.nextFitPack(docs, cap, shards)
        .collect().map(p => p.doc_id -> (p.shard, p.bin, p.start_tok)).toMap
      // reference: plain sequential next-fit over each shard's visit order
      val expect = lens.zipWithIndex
        .map { case (l, i) => (i.toLong, l, i.toLong % shards) }
        .groupBy(_._3).flatMap { case (shard, ds) =>
          var bin = 0L; var used = 0L
          ds.sortBy(d => (-d._2, d._1)).map { case (id, l, _) =>
            if (used > 0 && used + l > cap) { bin += 1; used = 0 }
            val start = used
            used += l
            id -> (shard, bin, start)
          }
        }
      got == expect
    }

  // ── Sketch-merge algebra ────────────────────────────────────────────
  // 100 TB tree-aggregation (per-partition sketches folded pairwise in
  // any order the scheduler picks) is sound only if merge is a lattice
  // join over the sketch space: partition-invariant, commutative in
  // effect, idempotent on subsets. q68/q69/h04/h01/h03 all lean on
  // these laws; the properties pin them over random multiset partitions.

  private def kmvRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  property("KMV merge: partition-invariant, order-invariant, subset-idempotent") =
    forAll(Gen.listOfN(24, Gen.choose(0L, 40L)), Gen.choose(1, 4)) { (xs, nParts) =>
      import spark.implicits._
      import graft.operators.Kmv
      val k = 8 // small k so random inputs actually saturate the sketch
      def sk(s: Seq[Long]) = Kmv.sketch(s.toDF("key"), "key", k)
      val whole = kmvRows(sk(xs))
      val parts = xs.zipWithIndex.groupBy(_._2 % nParts).toSeq.sortBy(_._1)
        .map { case (_, p) => sk(p.map(_._1)) }
      val fwd = kmvRows(parts.reduceLeft((a, b) => Kmv.merge(a, b, k)))
      val rev = kmvRows(parts.reverse.reduceLeft((a, b) => Kmv.merge(a, b, k)))
      val sub = kmvRows(Kmv.merge(sk(xs), sk(xs.take(xs.size / 2)), k))
      fwd == whole && rev == whole && sub == whole
    }

  property("HLL registers merge by per-register max over any partition") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 100000L)), Gen.choose(1, 4)) { (xs, nParts) =>
      import spark.implicits._
      import graft.operators.Hll
      def regs(s: Seq[Long]): Map[Long, Long] =
        if (s.isEmpty) Map.empty
        else Hll.registers(s.toDF("key"), col("key"), Nil).collect()
          .map(r => r.getAs[Number]("j").longValue ->
            r.getAs[Number]("rho_max").longValue).toMap
      val whole = regs(xs)
      val parts = xs.zipWithIndex.groupBy(_._2 % nParts).values
        .map(p => regs(p.map(_._1)))
      val merged = parts.flatten.groupBy(_._1)
        .map { case (j, vs) => j -> vs.map(_._2).max }
      merged == whole
    }

  property("Count-Min counters merge by cell-wise sum over any partition") =
    forAll(Gen.listOfN(30, Gen.choose(0, 20)), Gen.choose(1, 4)) { (ks, nParts) =>
      import spark.implicits._
      import graft.operators.CountMin
      graft.functions.NativeExprs.ensureRegistered(spark)
      def cm(s: Seq[Int]): Map[(Long, Long), Long] =
        if (s.isEmpty) Map.empty
        else CountMin.build(s.map(i => s"k$i").toDF("item"), "item").collect()
          .map(r => (r.getAs[Number]("row").longValue,
            r.getAs[Number]("colm").longValue) ->
            r.getAs[Number]("cell").longValue).toMap
      val whole = cm(ks)
      val parts = ks.zipWithIndex.groupBy(_._2 % nParts).values
        .map(p => cm(p.map(_._1)))
      val merged = parts.flatten.groupBy(_._1)
        .map { case (cell, vs) => cell -> vs.map(_._2).sum }
      merged == whole
    }

  property("KmvAggExpr equals bottom-k of the distinct mixed hashes, any multiset/partitioning") =
    forAll(Gen.listOfN(60, Gen.choose(0L, 40L)), Gen.choose(1, 5), Gen.choose(2, 12)) {
      (xs, nParts, k) =>
        import spark.implicits._
        import graft.operators.Kmv
        graft.functions.NativeExprs.ensureRegistered(spark)
        val got =
          if (xs.isEmpty) Nil
          else xs.toDF("key").repartition(nParts)
            .agg(Kmv.sketchAgg(Kmv.uhCol(col("key")), k)).head().getSeq[Long](0).toList
        val want = xs.distinct
          .map(x => graft.functions.NativeExprs.mix64(x) ^ Long.MinValue)
          .sorted.take(k)
        got == want
    }

  property("CmsAggExpr buffer fold: any partitioning/merge order == reference counters") =
    forAll(Gen.listOfN(50, Gen.choose(0L, 25L)), Gen.choose(1, 5)) { (hs, nParts) =>
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow => GIR}
      import org.apache.spark.sql.types.LongType
      val expr = graft.functions.CmsAggExpr(BoundReference(0, LongType, nullable = true))
      def fold(items: Seq[Long]): Array[Long] =
        items.foldLeft(expr.createAggregationBuffer()) { (b, h) =>
          expr.update(b, new GIR(Array[Any](h)))
        }
      def cells(buf: Array[Long]): Seq[Long] = buf.toSeq
      val whole = cells(fold(hs))
      // reference: 3 increments per hash at the 10-bit slice positions
      val ref = new Array[Long](3 * 1024)
      hs.foreach { h =>
        (0 until 3).foreach(r => ref(r * 1024 + ((h >>> (r * 10)) & 1023L).toInt) += 1L)
      }
      val parts = hs.zipWithIndex.groupBy(_._2 % nParts).toSeq.sortBy(_._1)
        .map { case (_, p) =>
          // serde round-trip on every partial, like a real shuffle
          expr.deserialize(expr.serialize(fold(p.map(_._1))))
        }
      // merge MUTATES its left buffer: clone per direction or the
      // forward pass taints the partials the reverse pass reads
      val fwd = cells(parts.map(_.clone).reduceLeft(expr.merge))
      val rev = cells(parts.reverse.map(_.clone).reduceLeft(expr.merge))
      whole == ref.toSeq && fwd == whole && rev == whole
    }
}
