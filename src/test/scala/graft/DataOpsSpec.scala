package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

class DataOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("dataops-spec")

  test("q71: searching the written-and-reloaded IVF-PQ index equals the in-line s05 path") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val dir = "/root/testdata/sf0.001"
    val inline = graft.queries.DataOps.s05(spark, dir).collect().map(_.toSeq).toSeq
    val persisted = graft.queries.DataOps.q71(spark, dir).collect().map(_.toSeq).toSeq
    assert(persisted == inline,
      "index persistence roundtrip changed the search result")
    // the index really lives on disk as four plain parquet tables
    val root = graft.queries.DataOps.annIndexRoot(dir)
    for (t <- Seq("coarse", "lists", "codebooks", "codes"))
      assert(new java.io.File(s"$root/$t").isDirectory, s"missing index table $t")
  }

  test("embedding corpus stays inside the fixed-point overflow bound") {
    // The Spark/DuckDB oracle equivalence of every similarity query
    // rests on |component| <= Similarity.MaxAbsEmbedding (non-ANSI Spark
    // would wrap int64 silently where DuckDB throws). Fail loudly here
    // if a future corpus breaks the coupling.
    val maxAbs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(max(aggregate(transform(col("embedding"),
        x => abs(x.cast("double"))), lit(0.0d), (acc, x) => greatest(acc, x))))
      .head.getDouble(0)
    assert(maxAbs <= graft.operators.Similarity.MaxAbsEmbedding,
      s"corpus max |component| $maxAbs exceeds the documented int64-safe bound")
  }

  test("wordNgramsAll: occurrence counting semantics, empty below k, no descending-sequence trap") {
    import spark.implicits._
    val df = Seq("a b a b a", "a b", "a", "").toDF("t")
      .select(TextOps.wordNgramsAll(TextOps.tokens(TextOps.normalize(col("t"))), 2).as("g"))
    val got = df.select(col("g")).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b", "b a", "a b", "b a")) // non-distinct, ordered
    assert(got(1) == Seq("a b"))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("dupNgramFrac: exact repetition rate, null on empty") {
    import spark.implicits._
    val df = Seq("a b a b a", "x y z").toDF("t")
      .select(TextOps.dupNgramFrac(
        TextOps.wordNgramsAll(TextOps.tokens(TextOps.normalize(col("t"))), 2)).as("f"))
    val got = df.collect()
    assert(got(0).getDouble(0) == 0.5) // 4 grams, 2 distinct
    assert(got(1).getDouble(0) == 0.0)
    val empty = Seq("a").toDF("t")
      .select(TextOps.dupNgramFrac(
        TextOps.wordNgramsAll(TextOps.tokens(TextOps.normalize(col("t"))), 2)).as("f"))
      .head
    assert(empty.isNullAt(0))
  }

  test("exact dedup keeps smallest id and counts group size") {
    import spark.implicits._
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y")).toDF("id", "t")
    val out = Dedup.exact(df, col("id"), md5(col("t")))
      .orderBy("t").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("id") == 1L) // smallest id survives for "x"
    assert(out(0).getAs[Long]("dup_group_size") == 2L)
    assert(out(1).getAs[Long]("dup_group_size") == 1L)
  }

  test("jaccard: exact set semantics") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).head.getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("minhash estimate approximates true jaccard on near-dup text") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val mut = base.dropRight(10)
    val df = Seq((1L, base), (2L, mut)).toDF("id", "t")
      .withColumn("sh", TextOps.shingles(TextOps.normalize(col("t")), 5))
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 64))
    val row = df.agg(
      Dedup.minHashEstimate(first(when(col("id") === 1, col("sig")), true),
        first(when(col("id") === 2, col("sig")), true)).as("est"),
      Dedup.jaccard(first(when(col("id") === 1, col("sh")), true),
        first(when(col("id") === 2, col("sh")), true)).as("true_j")).head
    val (est, truth) = (row.getDouble(0), row.getDouble(1))
    assert(truth > 0.7)
    assert(math.abs(est - truth) < 0.25) // 64 perms → sd ≈ sqrt(j(1-j)/64) ≈ 0.05
  }

  test("lsh candidate pairs recover identical and near-identical docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"), // near dup
      (4L, "completely different content about spark query engines entirely")
    ).toDF("id", "t")
      .withColumn("sig",
        Dedup.minHashSignature(TextOps.shingles(TextOps.normalize(col("t")), 5), 32))
    val pairs = Dedup.lshCandidatePairs(docs, col("id"), col("sig"), 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical text → distance 0; near text → small; distinct → large") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (4L, "totally unrelated words about weather forecasts rain snow wind sun")
    ).toDF("id", "t")
      .withColumn("sim", Dedup.simHash(TextOps.tokens(TextOps.normalize(col("t")))))
    val sims = df.orderBy("id").collect().map(_.getAs[Long]("sim"))
    assert(sims(0) == sims(1))
    assert(java.lang.Long.bitCount(sims(0) ^ sims(2)) <= 12)
    assert(java.lang.Long.bitCount(sims(0) ^ sims(3)) > 12)
  }

  test("fixed-point cosine matches double cosine to quantization error") {
    import spark.implicits._
    val a = Array(0.5f, -0.25f, 0.75f, 0.1f)
    val b = Array(0.4f, 0.3f, -0.2f, 0.9f)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val got = df.select(Similarity.cosineFromFixed(
      Similarity.dotFixed(Similarity.fixedVec(col("a")), Similarity.fixedVec(col("b"))),
      Similarity.normSqFixed(Similarity.fixedVec(col("a"))),
      Similarity.normSqFixed(Similarity.fixedVec(col("b"))))).head.getDouble(0)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val exp = dot / math.sqrt(a.map(x => x.toDouble * x).sum) /
      math.sqrt(b.map(x => x.toDouble * x).sum)
    assert(math.abs(got - exp) < 1e-5)
  }

  test("lsh ann achieves decent recall of brute-force top-5 neighbors") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(q, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.hyperplaneLshTopK(q, vecs, 5, dim = 16, numPlanes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall") // 2 planes → 4 buckets, ~25% baseline
    // every approx result must be a genuinely scored pair (sanity)
    assert(approx.forall { case (qid, cid) => qid != cid })
  }

  test("ivf ann achieves decent recall of brute-force top-5 neighbors") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    val vecs = (0L until 240L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") % 24 === 0)
    val exact = Similarity.bruteForceTopK(q, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, vecs, 5, numCentroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall")
    assert(ivf.forall { case (qid, cid) => qid != cid })
  }

  test("pq ann achieves high recall of brute-force top-5 neighbors") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val rng = new scala.util.Random(19)
    val vecs = (0L until 240L).map { i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") % 24 === 0)
    val exact = Similarity.bruteForceTopK(q, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // generous shortlist relative to |C| → the exact re-rank recovers
    // nearly everything the coarse codes mis-rank
    val pq = Similarity.pqTopK(q, vecs, 5, dim = 16, m = 4, ksub = 8,
        shortlist = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall > 0.6, s"recall=$recall")
    assert(pq.forall { case (qid, cid) => qid != cid })
  }

  test("residual ivf-pq recall beats-or-matches raw ivf-pq on clustered data") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    // clustered data is where residual encoding earns its keep: the
    // coarse centroid absorbs the cluster mean, codebooks only carry
    // the small displacement
    val rng = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    val vecs = (0L until 240L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") % 24 === 0)
    val exact = Similarity.bruteForceTopK(q, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val a = ann.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a.forall { case (qid, cid) => qid != cid })
      (exact & a).size.toDouble / exact.size
    }
    val res = recallOf(Similarity.ivfPqResidualTopK(q, vecs, 5, dim = 16,
      m = 4, ksub = 8, shortlist = 30, numCentroids = 8, nprobe = 3))
    val raw = recallOf(Similarity.ivfPqTopK(q, vecs, 5, dim = 16,
      m = 4, ksub = 8, shortlist = 30, numCentroids = 8, nprobe = 3))
    assert(res > 0.5, s"residual recall=$res")
    assert(res >= raw - 0.1, s"residual $res well below raw $raw")
  }

  test("sq8 ann achieves high recall of brute-force top-5 neighbors") {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val rng = new scala.util.Random(29)
    val vecs = (0L until 240L).map { i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") % 24 === 0)
    val exact = Similarity.bruteForceTopK(q, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bits/dim is a FINE quantizer — unlike PQ's 2 bits/dim here, the
    // approximate order nearly matches the exact one, so a modest
    // shortlist recovers essentially everything
    val sq8 = Similarity.sq8TopK(q, vecs, 5, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sq8).size.toDouble / exact.size
    assert(recall > 0.8, s"recall=$recall")
    assert(sq8.forall { case (qid, cid) => qid != cid })
  }

  test("boilerplate segments are removed from every doc; unique content kept in order") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val header = (1 to 8).map(i => s"nav$i").mkString(" ")
    val shared = (1 to 8).map(i => s"footer$i").mkString(" ")
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$header one two three four five six seven eight"),
      (3L, s"$header red orange yellow green blue indigo violet umber"),
      (4L, "lone doc with no shared header at all whatsoever ok"),
      // duplicated segment in the MIDDLE: kept_fp must join the kept
      // first and last segments in order
      (5L, s"a1 a2 a3 a4 a5 a6 a7 a8 $shared z1 z2 z3 z4 z5 z6 z7 z8"),
      (6L, s"b1 b2 b3 b4 b5 b6 b7 b8 $shared y1 y2 y3 y4 y5 y6 y7 y8")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.tokens(TextOps.normalize(col("text"))).as("toks"))
    val out = Dedup.boilerplateSegments(docs, col("doc_id"), col("toks"), 8)
      .orderBy("doc_id").collect()
    for (i <- 0 to 2) { // docs 1-3: header segment dropped everywhere
      assert(out(i).getAs[Long]("n_segments") == 2)
      assert(out(i).getAs[Long]("n_dup_segments") == 1)
      assert(out(i).getAs[Long]("kept_tokens") == 8)
    }
    assert(out(0).getAs[String]("kept_fp") ==
      md5hex("alpha beta gamma delta epsilon zeta eta theta"))
    // doc 4: nothing shared, everything kept
    assert(out(3).getAs[Long]("n_dup_segments") == 0)
    assert(out(3).getAs[Long]("kept_tokens") == 10)
    assert(out(3).getAs[String]("kept_fp") ==
      md5hex("lone doc with no shared header at all whatsoever ok"))
    // docs 5-6: middle footer dropped, first+last reassembled IN ORDER
    assert(out(4).getAs[Long]("n_segments") == 3)
    assert(out(4).getAs[Long]("n_dup_segments") == 1)
    assert(out(4).getAs[String]("kept_fp") ==
      md5hex("a1 a2 a3 a4 a5 a6 a7 a8 z1 z2 z3 z4 z5 z6 z7 z8"))
    assert(out(5).getAs[String]("kept_fp") ==
      md5hex("b1 b2 b3 b4 b5 b6 b7 b8 y1 y2 y3 y4 y5 y6 y7 y8"))
  }

  test("multimodal PNG codec: encode→decode roundtrip reproduces the formula pixels") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 12L, 37L)
    val recs = ids.map { id =>
      val (w, h) = (Multimodal.synthWidth(id), Multimodal.synthHeight(id))
      Multimodal.MediaRecord(id, Multimodal.PngKind,
        Multimodal.syntheticPng(id, w, h), w, h, 0)
    }.toDS()
    // the payload really is a PNG (magic bytes), not a fake
    val png = recs.head().content
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    val feats = Multimodal.extractFeatures(recs).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == ids.sorted)
    for (f <- feats) {
      val id = f.media_id
      val (w, h) = (Multimodal.synthWidth(id), Multimodal.synthHeight(id))
      assert(f.width == w && f.height == h) // dims come from the DECODE
      assert(f.byte_len > 8) // encoded payload, not raw pixels
      var (rs, gs, bs, ck) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = (Multimodal.pixelR(id, x, y),
          Multimodal.pixelG(id, x, y), Multimodal.pixelB(id, x, y))
        rs += r; gs += g; bs += b
        ck += ((r << 16) | (g << 8) | b).toLong * (y.toLong * w + x + 1)
      }
      assert((f.r_sum, f.g_sum, f.b_sum, f.px_checksum) == ((rs, gs, bs, ck)))
    }
    // non-image kinds keep the byte-level fingerprint path
    val txt = Seq(Multimodal.MediaRecord(1L, "text/utf-8",
      "hello world".getBytes("UTF-8"), 0, 0, 0)).toDS()
    val tf = Multimodal.extractFeatures(txt).head()
    assert(tf.byte_len == 11 && tf.width == 0 && tf.height == 0)
    val expCk = "hello world".getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => (b & 0xFF).toLong * (i + 1) }.sum
    assert(tf.px_checksum == expCk)
  }

  test("multimodal resize: NN resample matches the explicit src-index map") {
    import spark.implicits._
    val id = 9L
    val (w, h) = (Multimodal.synthWidth(id), Multimodal.synthHeight(id))
    val recs = Seq(Multimodal.MediaRecord(id, Multimodal.PngKind,
      Multimodal.syntheticPng(id, w, h), w, h, 0)).toDS()
    val resized = Multimodal.resize(recs, 3, 2).head()
    assert(resized.width == 3 && resized.height == 2)
    val img = Multimodal.decodePng(resized.content)
    assert(img.getWidth == 3 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val (sx, sy) = (x * w / 3, y * h / 2)
      val exp = (Multimodal.pixelR(id, sx, sy) << 16) |
        (Multimodal.pixelG(id, sx, sy) << 8) | Multimodal.pixelB(id, sx, sy)
      assert((img.getRGB(x, y) & 0xFFFFFF) == exp, s"pixel ($x,$y)")
    }
    // non-image kinds pass through untouched (resize is an image op)
    val raw = Seq(Multimodal.MediaRecord(2L, "video/rgb24",
      Array.tabulate(100)(_.toByte), 640, 480, 0)).toDS()
    val same = Multimodal.resize(raw, 320, 240).head()
    assert(same.width == 640 && same.content.length == 100)
  }

  test("WAV codec: encode→decode roundtrip reproduces the PCM formula samples") {
    import spark.implicits._
    val docs = Seq((3L, "x"), (11L, "y")).toDF("doc_id", "text")
    val media = Multimodal.wavFromDocuments(spark, docs).collect()
    // the payload really is a WAV (RIFF magic), not raw PCM
    val wav = media.head.content
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val feats = Multimodal.extractAudioFeatures(media.toSeq.toDS())
      .collect().sortBy(_.media_id)
    for (f <- feats) {
      val n = (400 + f.media_id % 100).toInt
      assert(f.n_samples == n && f.sample_rate == 8000)
      val samples = (0 until n).map(i => Multimodal.sampleAt(f.media_id, i).toLong)
      assert(f.s_sum == samples.sum && f.s_min == samples.min && f.s_max == samples.max)
      assert(f.s_checksum == samples.zipWithIndex.map { case (s, i) => s * (i + 1) }.sum)
    }
  }

  test("rawvideo frame sampling + channel stats decode the frames exactly") {
    import spark.implicits._
    val docs = Seq((7L, "x"), (8L, "y")).toDF("doc_id", "text")
    val media = Multimodal.rawVideoFromDocuments(spark, docs, w = 6, h = 4)
    // frame slicing: exact frame boundaries, every-2nd sampling
    val frames = Multimodal.frameSample(media, frameSize = 6 * 4 * 3, everyN = 2)
    val stats = Multimodal.frameChannelStats(frames, 6, 4)
      .collect().sortBy(s => (s.media_id, s.frame_idx))
    // id 7 → 2 + 7%3 = 3 frames → sampled 0,2 ; id 8 → 4 frames → 0,2
    assert(stats.map(s => (s.media_id, s.frame_idx)).toSeq ==
      Seq((7L, 0), (7L, 2), (8L, 0), (8L, 2)))
    for (s <- stats) {
      val fid = s.media_id + s.frame_idx * 13L
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (y <- 0 until 4; x <- 0 until 6) {
        rs += Multimodal.pixelR(fid, x, y)
        gs += Multimodal.pixelG(fid, x, y)
        bs += Multimodal.pixelB(fid, x, y)
      }
      assert((s.r_sum, s.g_sum, s.b_sum) == ((rs, gs, bs)))
    }
  }

  test("c04 output is all-integer: n_docs column replaces the ln() score") {
    // Round-4 verdict: a displayed tf·ln(N/df) put a non-correctly-
    // rounded transcendental on the hash path (latent cross-engine
    // last-ulp risk). The output now carries exact (tf, df, n_docs)
    // instead — assert the schema holds and n_docs matches the corpus.
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory)
    val out = graft.queries.CorpusOps.c04(spark, dir)
    assert(out.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq ==
      Seq("lang" -> "string", "term" -> "string", "tf" -> "long",
        "df" -> "long", "n_docs" -> "long", "rnk" -> "integer"))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy($"lang").agg(countDistinct($"doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- out.collect())
      assert(r.getAs[Long]("n_docs") == nDocs(r.getAs[String]("lang")))
  }

  test("langid tie resolves to first profile in marker order") {
    import spark.implicits._
    val df = Seq("la de").toDF("text") // hits es(la,de→2? de not in es set: el,la,de,y,es → la+de=2) and fr(le,la,et,de,est → la+de=2)
    val toks = TextOps.tokens(TextOps.normalize(col("text")))
    val withScores = TextOps.LangMarkers.foldLeft(df.withColumn("toks", toks)) {
      case (d, (lang, words)) => d.withColumn(s"s_$lang", TextOps.wordSetCount(col("toks"), words))
    }
    val pred = withScores.withColumn("p",
      TextOps.predictLang(TextOps.LangMarkers.map { case (l, _) => l -> col(s"s_$l") }))
      .head.getAs[String]("p")
    assert(pred == "es") // es listed before fr
  }
}
