package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeExprs
import graft.operators.{Dedup, Similarity, TextOps}

class NativeExprsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.local("native-exprs-spec")
    NativeExprs.register(s)
    s
  }

  test("native minhash estimate approximates true jaccard") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home today"
    val mut = base.dropRight(12)
    val df = Seq((1L, base), (2L, mut)).toDF("id", "t")
      .withColumn("sh", TextOps.shingles(TextOps.normalize(col("t")), 5))
      .withColumn("sig", call_function("graft_minhash32", col("sh")))
    val row = df.agg(
      Dedup.minHashEstimate(first(when(col("id") === 1, col("sig")), true),
        first(when(col("id") === 2, col("sig")), true)).as("est"),
      Dedup.jaccard(first(when(col("id") === 1, col("sh")), true),
        first(when(col("id") === 2, col("sh")), true)).as("true_j")).head
    assert(row.getDouble(1) > 0.7)
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 0.3)
  }

  test("fused shingle minhash equals minhash over materialized word shingles") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",          // fewer tokens than k
      "single",
      "a  b",             // empty token from double space survives split
      "der bericht und die zusammenfassung der kosten ist fertig und der plan")
    val df = docs.toDF("t").withColumn("toks", TextOps.tokens(col("t")))
    val rows = df.select(
      call_function("graft_minhash32_w3", col("toks")).as("fused"),
      call_function("graft_minhash32", TextOps.wordShingles(col("toks"), 3)).as("classic"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("native word ngrams match the interpreted HOF formulations (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val rows = (1 to 60).map { i =>
      val n = rnd.nextInt(8) // includes 0..k-1 token edge cases
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("id", "t")
      .withColumn("toks", TextOps.tokens(TextOps.normalize(col("t"))))
    for (k <- Seq(2, 3, 4)) {
      // the pre-native Column formulations, verbatim
      val hofShingles = array_distinct(transform(
        sequence(lit(1), greatest(size(col("toks")) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
      val hofAll = when(size(col("toks")) >= k,
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
        .otherwise(slice(col("toks"), lit(1), lit(0)))
      val bad = df.select(col("id"),
          TextOps.wordShingles(col("toks"), k).as("ns"), hofShingles.as("hs"),
          TextOps.wordNgramsAll(col("toks"), k).as("na"), hofAll.as("ha"))
        .filter(not(col("ns") === col("hs")) || not(col("na") === col("ha")))
      assert(bad.isEmpty, s"k=$k native/HOF ngram divergence: ${bad.head(3).mkString}")
    }
  }

  test("native word count matches the HOF formulation") {
    import spark.implicits._
    val df = Seq("the cat and the dog", "und der hund ist da", "", "x y z the")
      .toDF("t").withColumn("toks", TextOps.tokens(TextOps.normalize(col("t"))))
    val words = Seq("the", "and", "und", "ist")
    val rows = df.select(
      TextOps.wordSetCount(col("toks"), words).as("native"),
      size(filter(col("toks"),
        t => array_contains(array(words.map(lit): _*), t))).as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(rows.map(_.getInt(0)).toSeq == Seq(3, 2, 0, 1))
  }

  test("native minhash is deterministic and identical-input-identical-sig") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("id", "t")
      .withColumn("sig", call_function("graft_minhash32",
        TextOps.shingles(TextOps.normalize(col("t")), 5)))
    val sigs = df.select("sig").collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 32)
  }

  test("native simhash: identical 0-dist, near small, far large") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (4L, "totally unrelated words about weather forecasts rain snow wind sun")
    ).toDF("id", "t")
      .withColumn("sim", call_function("graft_simhash64",
        TextOps.tokens(TextOps.normalize(col("t")))))
    val sims = df.orderBy("id").collect().map(_.getAs[Long]("sim"))
    assert(sims(0) == sims(1))
    assert(java.lang.Long.bitCount(sims(0) ^ sims(2)) <= 12)
    assert(java.lang.Long.bitCount(sims(0) ^ sims(3)) > 12)
  }

  test("winnowing: deterministic, and shared substrings share fingerprints") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "INTRO TEXT " + a + " APPENDED TAIL" // contains a verbatim
    val c = "completely different content with no overlap whatsoever in any form"
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("id", "t")
      .withColumn("fp", call_function("graft_winnow", col("t")))
    val fps = df.orderBy("id").collect().map(_.getSeq[Long](2).toSet)
    assert(fps(0) == fps(1)) // deterministic
    assert(fps(0).nonEmpty && fps(0).size < a.length) // compressed
    // winnowing guarantee: long shared substring ⇒ shared fingerprints
    val overlap = (fps(0) & fps(2)).size.toDouble / fps(0).size
    assert(overlap > 0.5, s"overlap=$overlap")
    assert((fps(0) & fps(3)).isEmpty)
  }

  test("hilbert d2: codegen equals interpreted, bijective on a subgrid, locality holds") {
    import spark.implicits._
    import graft.functions.HilbertD2Expr
    import org.apache.spark.sql.catalyst.expressions.Literal
    // 32×32 subgrid spread over the full 16-bit domain
    val pts = for (i <- 0 until 32; j <- 0 until 32)
      yield (i.toLong * 2048L, j.toLong * 2048L)
    val viaCodegen = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        call_function("graft_hilbert_d2", col("x"), col("y")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // interpreted eval must agree exactly
    pts.take(64).foreach { case (x, y) =>
      val interp = HilbertD2Expr(Literal(x), Literal(y)).eval(null)
        .asInstanceOf[Long]
      assert(interp == viaCodegen((x, y)), s"codegen/interp split at ($x,$y)")
    }
    // a space-filling curve is a bijection: distinct cells, distinct d
    assert(viaCodegen.values.toSet.size == pts.size)
    assert(viaCodegen((0L, 0L)) == 0L) // curve starts at the origin
    // locality (the reason Hilbert beats Morton): d-NEIGHBORS on the
    // curve are grid-adjacent — check via the full-resolution curve on
    // a tiny corner patch where consecutive d values stay in-patch
    val corner = for (i <- 0L until 8L; j <- 0L until 8L) yield (i, j)
    val cd = corner.map { case (x, y) =>
      HilbertD2Expr(Literal(x), Literal(y)).eval(null).asInstanceOf[Long] -> (x, y)
    }.toMap
    val inOrder = cd.toSeq.sortBy(_._1).map(_._2)
    inOrder.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("native dot (codegen) equals HOF dot on fixed vectors") {
    import spark.implicits._
    val df = Seq((Seq(0.5f, -0.25f, 0.75f), Seq(0.4f, 0.3f, -0.2f))).toDF("a", "b")
      .withColumn("fa", Similarity.fixedVec(col("a")))
      .withColumn("fb", Similarity.fixedVec(col("b")))
    val row = df.select(
      call_function("graft_dot_fixed", col("fa"), col("fb")).as("native"),
      Similarity.dotFixed(col("fa"), col("fb")).as("hof")).head
    assert(row.getLong(0) == row.getLong(1))
  }
}
