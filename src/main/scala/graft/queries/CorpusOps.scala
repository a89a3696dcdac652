package graft.queries

import graft.QueryCaches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{Decontam, Hll, TextOps}
import graft.sources.Tables

/** Corpus-hygiene queries (c-series): the pre-training pipeline passes
  * beyond per-doc scoring — benchmark decontamination, repetition
  * filters, sampling, corpus-level term statistics. Shares the
  * documents-table conventions of [[DataOps]] (normalize once, exact
  * integer counts, dround outputs).
  */
object CorpusOps {

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** c01 — benchmark decontamination via 4-gram overlap: every 10th doc
    * plays the benchmark set, the rest are the training corpus, and
    * [[Decontam.contaminationReport]] flags training docs sharing any
    * word 4-gram (hash-keyed equi-join, string-confirmed). The oracle
    * joins on RAW n-gram strings — proving the Spark-side hash keying
    * is collision-free execution strategy, not semantics.
    */
  def c01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        TextOps.wordShingles(TextOps.tokens(TextOps.normalize($"text")), 4).as("ngs"))
    val train = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
      .withColumnRenamed("doc_id", "bench_id")
    Decontam.contaminationReport(train, "doc_id", bench, "bench_id", "ngs")
      .orderBy($"doc_id")
  }

  /** c02 — Gopher-style repetition filters: per doc, the top-token
    * fraction, top-2-gram token fraction, and within-doc duplicate-
    * 2-gram rate, plus the composite `keep` verdict. The dup rate is
    * per-row arithmetic (zero shuffle); the two mode counts are
    * explode → (doc, gram) count → per-doc max — two narrow hash
    * aggregations that scale linearly. The tokenized scan is persisted
    * because three branches consume it (text re-parse is the dominant
    * cost at corpus scale). Only max COUNTS are taken, never argmax
    * grams — no tie-break surface.
    */
  def c02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
      .persistScoped()
    val g2 = TextOps.wordNgramsAll($"toks", 2)
    val base = docs.select($"doc_id", size($"toks").cast("long").as("n_tokens"),
      gf.dround(TextOps.dupNgramFrac(g2), 4).as("dup_2gram_frac"))
    val tokTop = docs.select($"doc_id", explode($"toks").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_tok"))
    val g2Top = docs.select($"doc_id", explode(g2).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_g2"))
    base.join(tokTop, Seq("doc_id")).join(g2Top, Seq("doc_id"))
      .select($"doc_id", $"n_tokens",
        gf.dround($"top_tok".cast("double") / $"n_tokens", 4).as("top_token_frac"),
        gf.dround($"top_g2".cast("double") * 2 / $"n_tokens", 4).as("top_2gram_frac"),
        $"dup_2gram_frac")
      .withColumn("keep",
        $"top_token_frac" <= 0.12 && $"top_2gram_frac" <= 0.15 &&
          $"dup_2gram_frac" <= 0.08)
      .orderBy($"doc_id")
  }

  /** c03 — EXACT stratified sampling: within each language stratum,
    * keep the first ceil(25% · |stratum|) docs by md5(doc_id) order (a
    * deterministic, uniform, seed-free permutation — the p02 trick).
    * Unlike Bernoulli `sample()`, stratum fractions are hit exactly and
    * the selection is reproducible on any engine.
    *
    * Since round 5 this runs through [[graft.operators.Sampling]]'s
    * hash-prefix-bucketed selection — per-bucket windows + bucket
    * offsets instead of one stratum-wide sort (3 giant sort tasks for a
    * 3-language corpus at 100 TB). The ORACLE keeps the direct
    * stratum-wide `row_number` form: two algorithms, one hash.
    */
  def c03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Sampling
      .stratifiedExact(Tables.load(spark, dir, "documents"),
        stratum = "lang", id = "doc_id", num = 1, den = 4)
      .orderBy($"lang", $"sample_rank")
  }

  /** c04 — corpus term statistics: top-5 terms per language with tf,
    * per-stratum df, and the per-lang doc count. One explode feeds a
    * single (lang, term) aggregation (tf = occurrences, df = distinct
    * docs); per-lang doc counts broadcast-join back. Ranking uses EXACT
    * integer keys (tf desc, df asc, term asc) — the repo's
    * total-ordering rule — and the OUTPUT is all-integer too: `ln` is
    * not correctly-rounded IEEE, so a displayed tf·ln(N/df) could flip
    * a rounding boundary between engines on some future corpus
    * (round-4 verdict item). The standard score is exactly derivable
    * downstream from (tf, df, n_docs); nothing transcendental rides the
    * hash path.
    */
  def c04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
    val terms = docs.select($"lang", $"doc_id", explode($"toks").as("term"))
    val stats = terms.groupBy($"lang", $"term")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
    val langN = docs.groupBy($"lang").agg(countDistinct($"doc_id").as("n_docs"))
    stats.join(broadcast(langN), Seq("lang"))
      .withColumn("rnk", row_number().over(Window.partitionBy($"lang")
        .orderBy($"tf".desc, $"df".asc, $"term".asc)))
      .filter($"rnk" <= 5)
      .select($"lang", $"term", $"tf", $"df", $"n_docs", $"rnk")
      .orderBy($"lang", $"rnk")
  }

  /** c07 — sliding token-window chunking (64-token chunks, stride 48 →
    * 16-token overlap): the context-window packing primitive every
    * training pipeline runs between cleaning and tokenization. One
    * `sequence`-explode per doc + a `slice` per chunk — per-row
    * arithmetic, zero shuffle before the output sort, and chunk count
    * scales with Σ n_tokens/stride rather than doc count. Emits the
    * chunk TEXT itself so the oracle compares content exactly (DuckDB
    * list-slice clamp semantics mirror `slice`'s tail clamp — the d04
    * convention). A doc shorter than one chunk yields exactly one
    * (possibly short) chunk — no data is silently dropped.
    */
  def c07(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (chunk, stride) = (64, 48)
    Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
      .select($"doc_id", $"toks",
        explode(TextOps.chunkIdx($"toks", stride)).as("ci"))
      .select($"doc_id", $"ci".cast("int").as("chunk_idx"),
        TextOps.chunkSlice($"toks", $"ci", chunk, stride).as("ctoks"))
      .select($"doc_id", $"chunk_idx",
        size($"ctoks").as("n_chunk_tokens"),
        array_join($"ctoks", " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** c08 — weighted systematic (PPS) sampling by token count: 20 picks
    * laid proportionally along the deterministic hash permutation via
    * [[graft.operators.Sampling.weightedSystematic]] — "sample docs
    * proportional to token mass", the data-mixing primitive. All
    * integer arithmetic (weights, prefix sums, step boundaries), and
    * the prefix sum runs bucketed (no single-partition window); the
    * ORACLE computes the same picks with a direct global cumsum window
    * — two algorithms, one hash, scale shape only on the Spark side.
    */
  def c08(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weighted = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(TextOps.tokens(TextOps.normalize($"text"))).cast("long")
          .as("n_tokens"))
    graft.operators.Sampling.weightedSystematic(weighted, "doc_id", "n_tokens", 20)
      .orderBy($"pick_k")
  }

  /** c09 — square-root source quotas: cap each source at
    * ⌊√n_source⌋ docs (the sub-linear "staircase" rule corpus mixing
    * uses so no crawl domain dominates), keeping the longest docs first
    * (n_chars desc, doc_id tiebreak). `sqrt` is IEEE-correctly-rounded,
    * so ⌊√n⌋ of an exact integer is bit-identical across engines — the
    * one transcendental-adjacent op the numerics rules permit. The
    * per-source rank is a window over each source's docs; since
    * cap ≪ n, at 100 TB this becomes the c03 bucketed selection
    * (rank only the candidate prefix) — same output, and the oracle
    * (direct window form) would not change.
    */
  def c09(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars")
    val sizes = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_source"))
      .withColumn("cap",
        greatest(floor(sqrt($"n_source".cast("double"))).cast("long"), lit(1L)))
    docs.join(broadcast(sizes), Seq("source"))
      .withColumn("rnk", row_number().over(Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id")))
      .filter($"rnk" <= $"cap")
      .select($"source", $"doc_id", $"n_chars", $"rnk", $"n_source", $"cap")
      .orderBy($"source", $"rnk")
  }

  /** c10 — inverted-index build (the retrieval primitive RAG-corpus
    * work needs): per (term, doc) posting with term frequency and the
    * 1-based FIRST position. One posexplode feeds one hash aggregation
    * — shuffle volume is the posting count itself, nothing quadratic,
    * and the index shards naturally by term hash at scale. Restricted
    * to every 10th doc to keep the driver compare bounded; the plan is
    * the full-corpus plan. Positions are exact integers (posexplode
    * 0-based + 1 ≡ DuckDB generate_subscripts' 1-based).
    */
  def c10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
      .select($"doc_id", posexplode($"toks").as(Seq("pos", "term")))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"), (min($"pos") + 1).as("first_pos"))
      .orderBy($"term", $"doc_id")
  }

  /** c06 — typo-pair discovery via [[graft.operators.FuzzyJoin]]:
    * vocabulary (tokens ≥ 4 chars with corpus counts) plus DETERMINISTIC
    * planted typos (drop the last char of every ≥5-char word not already
    * a vocab token, cnt 0 — the d-series planted-structure pattern),
    * then all Levenshtein-1 pairs. The Spark side blocks by deletion
    * neighborhoods; the ORACLE computes the same pairs by brute-force
    * `levenshtein` over the (small) vocabulary — hash equality proves
    * the blocking is COMPLETE, not just plausible (the c01 convention:
    * oracle on raw semantics, blocking as execution strategy).
    */
  def c06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(TextOps.normalize($"text"))).as("token"))
      .filter(length($"token") >= 4)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .persistScoped() // plants anti-join + union both read it
    val plants = vocab.filter(length($"token") >= 5)
      .select($"token".substr(lit(1), length($"token") - 1).as("token"))
      .distinct()
      .join(vocab.select($"token"), Seq("token"), "left_anti")
      .withColumn("cnt", lit(0L))
    graft.operators.FuzzyJoin.lev1Pairs(vocab.unionByName(plants))
      .orderBy($"token_a", $"token_b")
  }

  /** c11 — training-sequence packing ([[graft.operators.Packing]]):
    * documents packed next-fit into 128-token context windows across 8
    * independent shards (doc_id % 8), visiting each shard in
    * (token-length DESC, doc_id) order. One repartition + one
    * partition-local sort + a single sequential scan per shard — the
    * industrial per-worker packing shape. The ORACLE replays the
    * identical sequential rule as a per-shard recursive CTE (all
    * shards advance in lockstep), so every (doc → shard, bin, offset)
    * assignment is hash-checked, not just bin counts.
    */
  def c11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokenCount($"text").cast("long").as("n_tokens"))
    graft.operators.Packing.nextFitPack(d, capacity = 128, numShards = 8)
      .toDF().orderBy($"doc_id")
  }

  /** c12 — exact repeated-substring dedup (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better"
    * family, complementing the document-level d-series): every
    * K=24-char window of the normalized text is a join key; a window
    * occurring in ≥2 DISTINCT docs marks a duplicated span at every
    * position it covers. Output per doc: window count, duplicated
    * count, dup fraction, keep verdict. The enumeration IS the
    * semantics (the oracle enumerates the identical substrings); the
    * documented scale path swaps the 24-char key for a rolling 8-byte
    * hash with exact verification of colliding windows only — the
    * d02 sketch→verify economics — leaving the same one group-by
    * shuffle as the only data movement.
    */
  def c12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = 24
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.normalize($"text").as("norm"))
      .filter(length($"norm") >= K)
    val wins = d
      .withColumn("i", explode(sequence(lit(1), length($"norm") - lit(K - 1))))
      .select($"doc_id", expr(s"substring(norm, i, $K)").as("wkey"))
    val dupKeys = wins.groupBy($"wkey")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
      .select($"wkey", lit(1).as("dup"))
    wins.join(dupKeys, Seq("wkey"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce($"dup", lit(0))).as("n_dup_windows"))
      .select($"doc_id", $"n_windows", $"n_dup_windows",
        gf.dround($"n_dup_windows".cast("double") / $"n_windows", 4)
          .as("dup_frac"))
      .withColumn("keep", $"dup_frac" < 0.5)
      .orderBy($"doc_id")
  }

  /** c13 — boilerplate segment removal (the RefinedWeb / CCNet
    * line-dedup family, here over deterministic 8-token segments since
    * the corpus has no newlines): each doc is partitioned into
    * NON-OVERLAPPING 8-token segments (c07's chunk machinery with
    * stride == size); a segment occurring in ≥ 2 distinct docs is
    * boilerplate and removed from EVERY doc (headers/footers
    * semantics — not keep-one like the d-series). Output per doc:
    * segment counts and the REASSEMBLED kept text (in segment order),
    * fingerprinted — so the hash proves the transform, not just the
    * scoring. Shape at scale: one segment group-by (the only shuffle
    * of segment data) + one hash-agg back to docs; segments are
    * hash-partitioned by content so the ≥2-docs test is local to each
    * reducer.
    */
  def c13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
    graft.operators.Dedup.boilerplateSegments(d, $"doc_id", $"toks", 8)
      .orderBy($"doc_id")
  }

  /** c14 — content-defined chunking (the rolling-hash boundary rule of
    * storage dedup / RAG splitters, token-level): a chunk boundary
    * falls AFTER token i whenever the hash of the 3-token window
    * ending at i lands in 1/16 of the hash space (md5 first hex digit
    * '0' — the same dialect-portable hash t04 rolls with). Unlike
    * c07's fixed-stride windows, boundaries are functions of CONTENT:
    * inserting one token reshapes only the chunks within ±2 tokens of
    * the edit, which is the property that makes chunk-level dedup
    * stable under edits. Expected chunk length is 16 tokens.
    *
    * Shape at scale: posexplode (no shuffle), ONE per-doc window (the
    * only shuffle — partitioned by doc_id), and a chunk group-by that
    * reuses the same doc_id clustering (no second exchange).
    */
  def c14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
      .select($"doc_id", $"toks", posexplode($"toks").as(Seq("p0", "tok")))
      .select($"doc_id", ($"p0" + 1).as("i"), $"tok",
        when($"p0" >= 2 && substring(md5(
            array_join(slice($"toks", $"p0" - 1, lit(3)), " ")), 1, 1) === "0",
          lit(1)).otherwise(lit(0)).as("b"))
    val chunked = t.withColumn("chunk_idx",
      (lit(1) + coalesce(sum($"b").over(
        Window.partitionBy($"doc_id").orderBy($"i")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0))).cast("int"))
    chunked.groupBy($"doc_id", $"chunk_idx")
      .agg(min($"i").as("start_tok"), count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"i", $"tok"))),
          s => s.getField("tok")), " ")).as("chunk_fp"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** c15 — bigram-LM quality scoring (the CCNet/KenLM filter family,
    * exact-integer form): a conditional-frequency "language model" is
    * trained on the 90% split (`doc_id % 10 != 0` — c01's convention)
    * and EVERY document is scored under it. Each bigram scores
    * `floor(cnt(w1 w2) · 10^6 / cnt(w1 ·))` — its train-split
    * conditional probability in parts-per-million; unseen bigrams
    * score 0 — and a doc's `lm_score` is the floor-average over its
    * bigrams. Rational integer math end-to-end: no ln/exp ever rides
    * the hash path (the c04 lesson), yet ranking by `lm_score` orders
    * documents the way mean per-token likelihood would.
    *
    * Scale shape: model building is one explode + hash agg over the
    * train split; scoring is two shuffled equi-joins (gram→count,
    * prefix→count) — linear end-to-end, no broadcast assumed (the
    * bigram model is Zipf-heavy but unbounded at 100 TB; AQE still
    * picks broadcast when it happens to fit). Docs with fewer than 2
    * tokens have no bigrams and are out of scope of the filter.
    */
  def c15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.NativeExprs.ensureRegistered(spark)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.wordNgramsAll(
        TextOps.tokens(TextOps.normalize($"text")), 2).as("g2"))
      .persistScoped()
    val model = docs.filter($"doc_id" % 10 =!= 0)
      .select(explode($"g2").as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c2"))
      .persistScoped()
    val prefix = model
      .groupBy(split($"g", " ").getItem(0).as("w1"))
      .agg(sum($"c2").as("c1"))
    docs.select($"doc_id", explode($"g2").as("g"))
      .join(model, Seq("g"), "left")
      .withColumn("w1", split($"g", " ").getItem(0))
      .join(prefix, Seq("w1"), "left")
      .withColumn("s", coalesce(expr("c2 * 1000000 div c1"), lit(0L)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"s").as("ssum"))
      .select($"doc_id", $"n_bigrams",
        expr("ssum div n_bigrams").as("lm_score"))
      .withColumn("keep", $"lm_score" >= 33000L)
      .orderBy($"doc_id")
  }

  /** c16 — BM25-family retrieval over the c10 inverted index (the
    * query-side half of the RAG/decontamination loop: given a snippet,
    * rank the corpus): every 100th document's first 8 distinct tokens
    * form a multi-term query, and all docs are scored
    * `Σ_t idf(t) · sat(tf, dl)` with textbook BM25 saturation
    * `tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` at k1=1.2, b=0.75 —
    * carried as EXACT integer rationals (k1, b, and milli-avgdl are
    * exact; the whole saturation term collapses to one integer-div of
    * int64 products in parts-per-million). The log-IDF is deliberately
    * replaced by the linear-inverse integer form `10^6·N div (df+1)`:
    * `ln` is not correctly-rounded IEEE and never rides the hash path
    * (the c04/c15 rule), and per-term monotonicity — all a scorer's
    * ranking needs from IDF — is preserved. At N beyond ~10^9 docs the
    * idf·sat product needs decimal(38,0); int64 is exact through every
    * test SF with big margin.
    *
    * Scale shape: postings + df are one explode + two hash aggs (the
    * c10 build); scoring is equi-joins keyed on term — query terms
    * fan out to exactly their postings, never the corpus — and the
    * final top-10 per query is a WindowGroupLimit, not a global sort.
    */
  def c16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokens(TextOps.normalize($"text")).as("toks"))
      .persistScoped() // feeds dl, postings, queries
    val dl = docs.select($"doc_id", size($"toks").cast("long").as("dl"))
    val postings = docs.select($"doc_id", explode($"toks").as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val df = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val consts = broadcast(
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("t_tokens"))
        .select($"n_docs", expr("t_tokens * 1000 div n_docs").as("avgdl_m")))
    val qterms = docs.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("query_id"), explode(slice($"toks", 1, 8)).as("term"))
      .distinct()
    // qterms is |docs|/100 × ≤8 rows — broadcast it so the corpus-sized
    // postings table is probed in place, never shuffled for this join;
    // df likewise never shuffles: it is semi-filtered down to the query
    // term set (bounded by |qterms|) via the same broadcast and then
    // broadcast itself — the only remaining shuffle is the dl join on
    // doc_id over the already-matched postings.
    val dfq = df.join(broadcast(qterms.select($"term").distinct()),
      Seq("term"), "left_semi")
    broadcast(qterms).join(postings, Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(consts)
      .withColumn("contrib", expr(
        """((1000000 * n_docs) div (df + 1)) *
          |((44 * tf * avgdl_m * 1000000)
          |  div (20 * tf * avgdl_m + 6 * avgdl_m + 18000 * dl)) div 1000000""".stripMargin))
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_terms_matched"), sum($"contrib").as("score_ppm"))
      .withColumn("rnk", row_number().over(Window.partitionBy($"query_id")
        .orderBy($"score_ppm".desc, $"doc_id")))
      .filter($"rnk" <= 10)
      .select($"query_id", $"rnk", $"doc_id", $"n_terms_matched", $"score_ppm")
      .orderBy($"query_id", $"rnk")
  }

  /** c17 — GPT-style concat-and-chunk packing (the OTHER packing
    * discipline next to c11's next-fit bins): documents are laid out in
    * a deterministic global SHUFFLE order (md5 of doc_id — the
    * decorrelated training order every pretraining run wants), token
    * counts (+1 EOS separator each) are prefix-summed into global
    * stream offsets, and each doc reports the fixed-size 256-token
    * blocks it spans — docs CROSS block boundaries by design (no
    * padding waste), unlike next-fit.
    *
    * The global running total uses the c08 bucketed scale path: 256
    * md5-prefix buckets → per-bucket sums → cumulative offsets over the
    * ≤256-row bucket TABLE → within-bucket windows. One narrow shuffle
    * + a broadcast of 256 offsets; no single-partition window anywhere,
    * which is what makes a corpus-wide prefix sum admissible at 100 TB.
    */
  def c17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        (TextOps.tokenCount($"text") + 1).cast("long").as("n_tok"),
        md5($"doc_id".cast("string").cast("binary")).as("h"))
      .withColumn("bkt", conv(substring($"h", 1, 2), 16, 10).cast("int"))
    val counts = d.groupBy($"bkt").agg(sum($"n_tok").as("bw"))
    val wPrefix = Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)
    // ≤256 rows: unpartitioned window over the bucket TABLE (c08 rule)
    val offsets = counts
      .withColumn("off", coalesce(sum($"bw").over(wPrefix), lit(0L)))
      .select($"bkt", $"off")
    val wBkt = Window.partitionBy($"bkt").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offsets), Seq("bkt"))
      .withColumn("end_off", $"off" + sum($"n_tok").over(wBkt))
      .select($"doc_id", $"n_tok", ($"end_off" - $"n_tok").as("start_off"),
        expr("(end_off - n_tok) div 256").as("first_block"),
        expr("(end_off - 1) div 256").as("last_block"))
      .withColumn("n_blocks", $"last_block" - $"first_block" + 1)
      .orderBy($"doc_id")
  }

  /** c18 — deterministic negative-pair mining (contrastive/embedding
    * training needs N negatives per anchor; RANDOM sampling is
    * irreproducible and self-collision-prone): documents are ranked on
    * the md5 ring (c17's shuffle order, same bucketed global-rank
    * machinery — no single-partition window), and each anchor's 3
    * negatives sit at large data-independent ring offsets
    * `1 + (n·a) div b` for (a,b) = (1,7), (1,3), (2,5) — far from the
    * anchor in hash space (no topical correlation), never the anchor
    * itself (offsets in [1, n)), and exactly reproducible at any
    * parallelism. Tiny corpora may collapse two offsets onto one
    * document — duplicate negatives are legal and deterministic.
    *
    * Scale shape: two narrow shuffles (bucket counts, rank equi-join);
    * the ring-target join is a plain equi-join on the target rank.
    */
  def c18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id", md5($"doc_id".cast("string").cast("binary")).as("h"))
      .withColumn("bkt", conv(substring($"h", 1, 2), 16, 10).cast("int"))
    val counts = d.groupBy($"bkt").agg(count(lit(1)).as("bn"))
    val wPrefix = Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)
    // ≤256 rows: window over the bucket TABLE (c08 rule)
    val offsets = counts
      .withColumn("off", coalesce(sum($"bn").over(wPrefix), lit(0L)))
      .select($"bkt", $"off")
    val wBkt = Window.partitionBy($"bkt").orderBy($"h", $"doc_id")
    val ranks = d.join(broadcast(offsets), Seq("bkt"))
      .withColumn("r", $"off" + row_number().over(wBkt) - 1)
      .select($"doc_id", $"r")
      .persistScoped() // anchors + ring targets both read it
    val n = broadcast(ranks.agg(count(lit(1)).as("n")))
    val targets = ranks.crossJoin(n)
      .select($"doc_id", $"r", $"n",
        posexplode(array(
          lit(1) + expr("n div 7"),
          lit(1) + expr("n div 3"),
          lit(1) + expr("(2 * n) div 5"))).as(Seq("k", "o")))
      .select($"doc_id", ($"k" + 1).as("k"), (($"r" + $"o") % $"n").as("tr"))
    targets
      .join(ranks.select($"r".as("tr"), $"doc_id".as("neg_id")), Seq("tr"))
      .select($"doc_id", $"k", $"neg_id")
      .orderBy($"doc_id", $"k")
  }

  /** c19 — T5-style span-corruption masks, deterministically (the
    * pretraining objective's data prep: ~15% of each doc's tokens
    * masked in mean-length-3 spans; RANDOM spans are irreproducible
    * across re-runs and engines): span count and lengths come from
    * exact integer arithmetic (`n_mask = 15n div 100`, remainder spread
    * over the first spans), non-overlap is BY CONSTRUCTION — span j
    * lives inside the j-th of n_spans equal segments — and the offset
    * within its segment is the doc+span splitmix64 hash mod the
    * segment's slack. Per-row arithmetic only (one small sequence
    * explode per doc, zero shuffle before the output sort); docs under
    * 7 tokens have n_mask = 0 and emit no spans.
    */
  def c19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", TextOps.tokenCount($"text").cast("long").as("n"))
      .withColumn("n_mask", expr("n * 15 div 100"))
      .filter($"n_mask" >= 1)
      .withColumn("n_spans", greatest(lit(1L), expr("n_mask div 3")))
      .select($"doc_id", $"n", $"n_mask", $"n_spans",
        explode(sequence(lit(0L), $"n_spans" - 1)).as("j"))
      .withColumn("len", expr("n_mask div n_spans") +
        when($"j" < expr("n_mask % n_spans"), 1L).otherwise(0L))
      .withColumn("seg_start", expr("(n * j) div n_spans"))
      .withColumn("room",
        expr("(n * (j + 1)) div n_spans") - $"seg_start" - $"len" + 1)
      .withColumn("off",
        shiftrightunsigned(Hll.mix64Col($"doc_id" * 31 + $"j"), 1) % $"room")
      .select($"doc_id", ($"j" + 1).as("span_k"),
        ($"seg_start" + $"off" + 1).as("start"), $"len")
      .orderBy($"doc_id", $"span_k")
  }

  /** Merge count for c20 — the oracle unrolls exactly this many rounds. */
  val BpeMerges = 10

  /** c20 — BPE pair-merge trainer ([[graft.operators.Bpe]]): 10 merges
    * trained on the corpus's lowercase-alpha word-frequency table
    * (`^[a-z]+$` — the classic character-alphabet restriction, which
    * also pins both engines to pure-ASCII symbols so substring/compare
    * semantics cannot diverge). Output is the merge table: per step the
    * merged pair, its weighted adjacent-occurrence count at merge time,
    * and the post-merge distinct-symbol vocabulary size. Ties break
    * (count DESC, lhs, rhs) — a total order, so the whole training
    * trajectory is deterministic and the ORACLE replays it exactly:
    * 10 unrolled rounds of pair-count → top-1 → gaps-and-islands greedy
    * merge in one DuckDB statement (per-round CTEs MATERIALIZED — the
    * g06 lesson; each is referenced twice). A different merge engine —
    * relational window replay vs the native per-row loop — agreeing on
    * every step's argmax AND the downstream vocabulary is a strong
    * whole-trajectory check, same doctrine as the k-means/PQ oracles.
    */
  /** The corpus word-frequency table c20/c21 train on: lowercase-alpha
    * whitespace tokens with occurrence counts.
    */
  private def bpeWords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(TextOps.normalize($"text"))).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** Memoized merge table per (dir, numMerges): c20 and c21 both need
    * the trained vocabulary, and training is deterministic in the
    * corpus, so one verify/bench pass trains it exactly once instead of
    * re-running the full iterative loop per query.
    */
  private val bpeStepsCache =
    new scala.collection.concurrent.TrieMap[(String, Int), Seq[graft.operators.Bpe.MergeStep]]

  /** Test hook: drop memoized trainings so invariance runs retrain. */
  private[graft] def clearBpeCache(): Unit = bpeStepsCache.clear()
  private def trainedBpeSteps(spark: SparkSession, dir: String): Seq[graft.operators.Bpe.MergeStep] =
    bpeStepsCache.getOrElseUpdate((dir, BpeMerges),
      graft.operators.Bpe.train(bpeWords(spark, dir), BpeMerges)._1)

  def c20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val steps = trainedBpeSteps(spark, dir)
    spark.createDataFrame(steps)
      .select($"step", $"lhs", $"rhs", concat($"lhs", $"rhs").as("merged"),
        $"pair_freq", $"vocab_size")
      .orderBy($"step")
  }

  /** c21 — the trained BPE vocabulary APPLIED corpus-wide: after c20's
    * 10 merges, every word's final symbol sequence is exploded into
    * per-token stats — distinct words containing the token and
    * freq-weighted total occurrences — top-25 by occurrences (token
    * tiebreak). The train→apply round trip BpeSpec pins per-word is
    * here pinned corpus-wide against the oracle's independent
    * relational replay of the same trajectory. Apply is the scale
    * story: tokenizing with a TRAINED vocabulary is a pure map-side
    * projection; the only shuffle is the final token aggregate.
    */
  def c21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Tokenize with the TRAINED table via the single-expression encoder
    // (graft_bpe_apply) rather than reusing training's sequence frame —
    // this is the production shape: merges are a broadcast literal, the
    // corpus pass is map-side, and BpeSpec pins apply ≡ train output.
    val steps = trainedBpeSteps(spark, dir)
    val seqs = graft.operators.Bpe.applyMerges(
      bpeWords(spark, dir), steps.map(s => (s.lhs, s.rhs)))
    seqs.select($"word", $"freq", explode($"s").as("token"))
      .groupBy($"token")
      .agg(countDistinct($"word").as("n_words"),
        sum($"freq").as("n_occurrences"))
      .orderBy(desc("n_occurrences"), $"token")
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c20_bpe_merges" -> c20,
    "c21_bpe_tokenize" -> c21,
    "c16_bm25" -> c16,
    "c17_concat_chunks" -> c17,
    "c18_negative_pairs" -> c18,
    "c19_span_corruption" -> c19,
    "c15_lm_quality" -> c15,
    "c11_sequence_packing" -> c11,
    "c12_substring_dedup" -> c12,
    "c13_segment_dedup" -> c13,
    "c14_cdc_chunking" -> c14,
    "c01_decontaminate" -> c01,
    "c02_repetition_filter" -> c02,
    "c03_stratified_sample" -> c03,
    "c04_tfidf_topk" -> c04,
    "c06_typo_pairs" -> c06,
    "c07_chunking" -> c07,
    "c08_weighted_sample" -> c08,
    "c09_source_quota" -> c09,
    "c10_inverted_index" -> c10
  )

  // wordShingles clamp semantics: a doc shorter than n tokens yields ONE
  // whole-text shingle — mirrored by greatest(len(toks)-(n-2), 2) range
  // bounds + DuckDB list-slice clamping (the proven d04 pattern).
  val oracles: Map[String, String] = Map(
    "c20_bpe_merges" -> DuckSketchSql.c20(BpeMerges),
    "c21_bpe_tokenize" -> DuckSketchSql.c21(BpeMerges),
    // c17: the oracle takes the single-node shortcut the Spark side
    // can't — ONE global window over (md5, doc_id); block math is
    // integer `//` on non-negative offsets
    "c17_concat_chunks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) + 1 AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    sum(n_tok) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
        |  FROM d)
        |SELECT doc_id, n_tok,
        |  CAST(end_off - n_tok AS BIGINT) AS start_off,
        |  CAST((end_off - n_tok) // 256 AS BIGINT) AS first_block,
        |  CAST((end_off - 1) // 256 AS BIGINT) AS last_block,
        |  CAST((end_off - 1) // 256 - (end_off - n_tok) // 256 + 1 AS BIGINT)
        |    AS n_blocks
        |FROM c ORDER BY doc_id""".stripMargin,
    "c19_span_corruption" -> DuckSketchSql.c19,
    // c18: the oracle ranks with ONE global window (single-node
    // shortcut); ring arithmetic is `//` ≡ `div` on non-negatives
    "c18_negative_pairs" ->
      """WITH r0 AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS r,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM r0),
        |t AS (
        |  SELECT doc_id, r, n, unnest([1, 2, 3]) AS k,
        |    unnest([1 + n // 7, 1 + n // 3, 1 + (2 * n) // 5]) AS o
        |  FROM r)
        |SELECT t.doc_id, CAST(t.k AS INT) AS k, rr.doc_id AS neg_id
        |FROM t JOIN r rr ON (t.r + t.o) % t.n = rr.r
        |ORDER BY t.doc_id, k""".stripMargin,
    // c16: identical integer rationals — DuckDB `//` ≡ Spark `div` on
    // the non-negative operands here; HUGEINT sums cast back to BIGINT
    "c16_bm25" ->
      s"""WITH n AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM n),
         |p AS (SELECT doc_id, unnest(toks) AS term FROM n),
         |postings AS (
         |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM p GROUP BY 1, 2),
         |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM postings GROUP BY 1),
         |consts AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS avgdl_m
         |  FROM dl),
         |q AS (SELECT DISTINCT query_id, term FROM (
         |    SELECT doc_id AS query_id, unnest(toks[1:8]) AS term
         |    FROM n WHERE doc_id % 100 = 0)),
         |sc AS (
         |  SELECT q.query_id, postings.doc_id,
         |    ((1000000 * n_docs) // (df + 1)) *
         |    ((44 * tf * avgdl_m * 1000000)
         |      // (20 * tf * avgdl_m + 6 * avgdl_m + 18000 * dl)) // 1000000 AS contrib
         |  FROM q
         |  JOIN postings USING (term)
         |  JOIN dfx USING (term)
         |  JOIN dl ON postings.doc_id = dl.doc_id
         |  CROSS JOIN consts),
         |agg AS (
         |  SELECT query_id, doc_id,
         |    CAST(count(*) AS BIGINT) AS n_terms_matched,
         |    CAST(sum(contrib) AS BIGINT) AS score_ppm
         |  FROM sc GROUP BY 1, 2),
         |r AS (
         |  SELECT query_id, doc_id, n_terms_matched, score_ppm,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_ppm DESC, doc_id) AS INT) AS rnk
         |  FROM agg)
         |SELECT query_id, rnk, doc_id, n_terms_matched, score_ppm
         |FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,
    // c15: identical bigram space (c02's list comprehension), identical
    // integer ppm scores — DuckDB's `//` and Spark's `div` agree on
    // non-negative operands
    "c15_lm_quality" ->
      s"""WITH n AS (
         |  SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (
         |  SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
         |g AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
         |  FROM t),
         |model AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM g
         |  WHERE doc_id % 10 <> 0 GROUP BY g),
         |pfx AS (
         |  SELECT string_split(g, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1
         |  FROM model GROUP BY 1),
         |sc AS (
         |  SELECT d.doc_id, COALESCE(m.c2 * 1000000 // p.c1, 0) AS s
         |  FROM g d
         |  LEFT JOIN model m USING (g)
         |  LEFT JOIN pfx p ON string_split(d.g, ' ')[1] = p.w1),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(s) AS BIGINT) AS ssum
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST(ssum // n_bigrams AS BIGINT) AS lm_score,
         |  ssum // n_bigrams >= 33000 AS keep
         |FROM agg ORDER BY doc_id""".stripMargin,
    "c12_substring_dedup" ->
      s"""WITH n0 AS (SELECT doc_id, $normSql AS norm FROM documents),
         |d AS (SELECT doc_id, norm FROM n0 WHERE length(norm) >= 24),
         |ws AS (SELECT doc_id, norm,
         |         unnest(range(1, length(norm) - 22)) AS i
         |       FROM d),
         |win AS (SELECT doc_id, substring(norm, CAST(i AS INT), 24) AS wkey
         |        FROM ws),
         |dk AS (SELECT wkey FROM (
         |         SELECT wkey, count(DISTINCT doc_id) AS nd
         |         FROM win GROUP BY 1) t
         |       WHERE nd >= 2),
         |f AS (SELECT win.doc_id,
         |        CASE WHEN dk.wkey IS NOT NULL THEN 1 ELSE 0 END AS dup
         |      FROM win LEFT JOIN dk ON win.wkey = dk.wkey)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(dup) AS BIGINT) AS n_dup_windows,
         |  round(CAST(sum(dup) AS DOUBLE) / count(*), 4) AS dup_frac,
         |  round(CAST(sum(dup) AS DOUBLE) / count(*), 4) < 0.5 AS keep
         |FROM f GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "c11_sequence_packing" ->
      """WITH RECURSIVE
        |d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    doc_id % 8 AS shard
        |  FROM documents),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard
        |    ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM d),
        |pk AS (
        |  SELECT shard, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS start_tok
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  -- next-fit step: used = start + len of the previous doc; open
        |  -- a new bin iff the bin is non-empty and this doc overflows
        |  SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
        |    CASE WHEN pk.start_tok + pk.n_tokens > 0
        |              AND pk.start_tok + pk.n_tokens + r.n_tokens > 128
        |         THEN pk.bin + 1 ELSE pk.bin END,
        |    CASE WHEN pk.start_tok + pk.n_tokens > 0
        |              AND pk.start_tok + pk.n_tokens + r.n_tokens > 128
        |         THEN 0 ELSE pk.start_tok + pk.n_tokens END
        |  FROM pk JOIN r ON r.shard = pk.shard AND r.rn = pk.rn + 1)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, start_tok, n_tokens
        |FROM pk ORDER BY doc_id""".stripMargin,
    "c01_decontaminate" ->
      s"""WITH n AS (
         |  SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (
         |  SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
         |g AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+3], ' ')
         |     FOR i IN range(1, greatest(len(toks) - 2, 2))]) AS ngs
         |  FROM t),
         |trainex AS (
         |  SELECT doc_id, len(ngs) AS n_ngrams, unnest(ngs) AS ng
         |  FROM g WHERE doc_id % 10 <> 0),
         |benchex AS (
         |  SELECT doc_id AS bench_id, unnest(ngs) AS ng
         |  FROM g WHERE doc_id % 10 = 0)
         |SELECT t.doc_id, max(t.n_ngrams) AS n_ngrams,
         |  count(DISTINCT t.ng) AS n_hits,
         |  round(CAST(count(DISTINCT t.ng) AS DOUBLE) / max(t.n_ngrams), 4)
         |    AS contaminated_frac,
         |  count(DISTINCT b.bench_id) AS n_bench_docs
         |FROM trainex t JOIN benchex b ON t.ng = b.ng
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "c02_repetition_filter" ->
      s"""WITH n AS (
         |  SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (
         |  SELECT doc_id, string_split(norm, ' ') AS toks FROM n),
         |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tc AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY doc_id, tok),
         |ttop AS (SELECT doc_id, max(c) AS top_tok FROM tc GROUP BY 1),
         |g2e AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
         |  FROM t),
         |g2c AS (SELECT doc_id, count(*) AS c FROM g2e GROUP BY doc_id, g),
         |g2top AS (SELECT doc_id, max(c) AS top_g2 FROM g2c GROUP BY 1),
         |base AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    len([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS tot2,
         |    len(list_distinct([array_to_string(toks[i:i+1], ' ')
         |      FOR i IN range(1, len(toks))])) AS dis2
         |  FROM t),
         |f AS (
         |  SELECT b.doc_id, b.n_tokens,
         |    round(CAST(top_tok AS DOUBLE) / b.n_tokens, 4) AS top_token_frac,
         |    round(CAST(top_g2 AS DOUBLE) * 2 / b.n_tokens, 4) AS top_2gram_frac,
         |    round(CASE WHEN tot2 > 0
         |      THEN CAST(tot2 - dis2 AS DOUBLE) / tot2 END, 4) AS dup_2gram_frac
         |  FROM base b JOIN ttop USING (doc_id) JOIN g2top USING (doc_id))
         |SELECT doc_id, n_tokens, top_token_frac, top_2gram_frac, dup_2gram_frac,
         |  top_token_frac <= 0.12 AND top_2gram_frac <= 0.15
         |    AND dup_2gram_frac <= 0.08 AS keep
         |FROM f ORDER BY doc_id""".stripMargin,
    "c03_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hh,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS sample_rank
        |  FROM h)
        |SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
        |FROM r WHERE sample_rank <= ceil(n * 0.25)
        |ORDER BY lang, sample_rank""".stripMargin,
    "c04_tfidf_topk" ->
      s"""WITH n AS (
         |  SELECT doc_id, lang, $normSql AS norm FROM documents),
         |terms AS (
         |  SELECT lang, doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
         |stats AS (
         |  SELECT lang, term, count(*) AS tf, count(DISTINCT doc_id) AS df
         |  FROM terms GROUP BY 1, 2),
         |ln_ AS (SELECT lang, count(DISTINCT doc_id) AS n_docs FROM n GROUP BY 1),
         |r AS (
         |  SELECT s.lang, s.term, s.tf, s.df, l.n_docs,
         |    row_number() OVER (PARTITION BY s.lang
         |      ORDER BY s.tf DESC, s.df ASC, s.term ASC) AS rnk
         |  FROM stats s JOIN ln_ l USING (lang))
         |SELECT lang, term, tf, df, n_docs,
         |  CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 5
         |ORDER BY lang, rnk""".stripMargin,
    "c06_typo_pairs" ->
      s"""WITH n AS (SELECT $normSql AS norm FROM documents),
         |tok AS (SELECT unnest(string_split(norm, ' ')) AS token FROM n),
         |v AS (SELECT token, count(*) AS cnt FROM tok
         |      WHERE length(token) >= 4 GROUP BY 1),
         |pl AS (SELECT DISTINCT substr(token, 1, length(token) - 1) AS token
         |       FROM v WHERE length(token) >= 5),
         |pl2 AS (SELECT token, CAST(0 AS BIGINT) AS cnt FROM pl
         |        WHERE token NOT IN (SELECT token FROM v)),
         |v2 AS (SELECT token, cnt FROM v UNION ALL SELECT token, cnt FROM pl2)
         |SELECT a.token AS token_a, b.token AS token_b,
         |  a.cnt AS cnt_a, b.cnt AS cnt_b
         |FROM v2 a JOIN v2 b
         |  ON a.token < b.token AND levenshtein(a.token, b.token) = 1
         |ORDER BY token_a, token_b""".stripMargin,
    // c14: identical boundary rule — md5 of the 3-token window ending
    // at i, first hex digit '0'; chunk id = 1 + boundaries strictly
    // before i (window sum); reassembly ordered by position
    "c14_cdc_chunking" ->
      s"""WITH n AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |x AS (
         |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM n),
         |t AS (
         |  SELECT doc_id, i, toks[CAST(i AS INT)] AS tok,
         |    CASE WHEN i >= 3 AND substr(md5(array_to_string(
         |        toks[CAST(i - 2 AS INT) : CAST(i AS INT)], ' ')), 1, 1) = '0'
         |      THEN 1 ELSE 0 END AS b
         |  FROM x),
         |c AS (
         |  SELECT doc_id, i, tok,
         |    1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
         |  FROM t)
         |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         |  CAST(min(i) AS BIGINT) AS start_tok,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_fp
         |FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""".stripMargin,
    // c13: same chunk enumeration as c07 at stride == size == 8; dup
    // detection on the space-joined segment; reassembly via ordered
    // string_agg FILTER (empty doc → NULL → coalesce '' = Spark's "")
    "c13_segment_dedup" ->
      s"""WITH n AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |x AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, (len(toks) - 1) // 8 + 1)) AS si
         |  FROM n),
         |s AS (
         |  SELECT doc_id, CAST(si AS INT) AS seg_idx,
         |    CAST(len(toks[si*8 + 1 : si*8 + 8]) AS BIGINT) AS n_seg_tokens,
         |    array_to_string(toks[si*8 + 1 : si*8 + 8], ' ') AS seg
         |  FROM x),
         |dk AS (
         |  SELECT seg FROM (
         |    SELECT seg, count(DISTINCT doc_id) AS nd FROM s GROUP BY 1) t
         |  WHERE nd >= 2),
         |f AS (
         |  SELECT s.doc_id, s.seg_idx, s.n_seg_tokens, s.seg,
         |    dk.seg IS NOT NULL AS dup
         |  FROM s LEFT JOIN dk ON s.seg = dk.seg)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_segments,
         |  CAST(coalesce(sum(n_seg_tokens) FILTER (WHERE NOT dup), 0)
         |    AS BIGINT) AS kept_tokens,
         |  md5(coalesce(
         |    string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE NOT dup),
         |    '')) AS kept_fp
         |FROM f GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // chunk_idx ranges over 0..(len-1)//stride; DuckDB list slices clamp
    // at the tail exactly like Spark `slice` (the d04 convention)
    "c07_chunking" ->
      s"""WITH n AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |x AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, (len(toks) - 1) // 48 + 1)) AS ci
         |  FROM n)
         |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         |  CAST(len(toks[ci*48 + 1 : ci*48 + 64]) AS INT) AS n_chunk_tokens,
         |  array_to_string(toks[ci*48 + 1 : ci*48 + 64], ' ') AS chunk_text
         |FROM x
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    // direct global-cumsum formulation of Sampling.weightedSystematic —
    // the Spark side computes the same picks bucketed (two algorithms,
    // one hash). sums CAST to BIGINT (DuckDB sum(BIGINT) → HUGEINT).
    "c08_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(sum(n_tokens) OVER () AS BIGINT) AS total
         |  FROM w),
         |p AS (
         |  SELECT doc_id, n_tokens, cum,
         |    greatest(total // 20, 1) AS step
         |  FROM c)
         |SELECT unnest(range((cum - n_tokens) // step + 1,
         |    least(cum // step, 20) + 1)) AS pick_k,
         |  doc_id, n_tokens
         |FROM p
         |ORDER BY pick_k""".stripMargin,
    "c09_source_quota" ->
      """WITH sz AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_source,
        |    greatest(CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT), 1)
        |      AS cap
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS INT) AS rnk
        |  FROM documents)
        |SELECT r.source, r.doc_id, r.n_chars, r.rnk, sz.n_source, sz.cap
        |FROM r JOIN sz USING (source)
        |WHERE rnk <= cap
        |ORDER BY source, rnk""".stripMargin,
    "c10_inverted_index" ->
      s"""WITH n AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks
         |  FROM documents WHERE doc_id % 10 = 0),
         |e AS (
         |  SELECT doc_id, unnest(toks) AS term,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM n)
         |SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         |  CAST(min(pos) AS INT) AS first_pos
         |FROM e GROUP BY 1, 2
         |ORDER BY term, doc_id""".stripMargin
  )
}
