package graft.queries

import graft.QueryCaches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** The composed training-data cleaning pipeline — the operators the
  * rest of the suite verifies individually, chained the way a corpus
  * run chains them, as ONE declarative plan with ONE exact oracle
  * ([[DuckSketchSql.p01]]):
  *
  *   1. exact dedup (per-language md5 fingerprint, min-id survivor);
  *   2. near-dup removal: MinHash(32)+LSH(8×4) candidates → EXACT
  *      word-shingle Jaccard verify ≥ 0.7 → connected components →
  *      keep the min-id representative;
  *   3. quality filter (integer-ratio score ≥ 50);
  *   4. language-ID filter (drop docs whose marker argmax confidently
  *      disagrees with the label; 'und' passes);
  *   5. per-language stats (docs, token budget, fixed-point avg score).
  *
  * Scale shape: two hash-aggregation shuffles (dedup, final stats), the
  * LSH band equi-join, and the pair-verification joins — nothing
  * quadratic, nothing driver-side except clusterPairs' O(log diameter)
  * loop. Exactly the plan you'd run at corpus scale, minus only
  * bucketing the intermediate tables.
  */
object Pipeline {

  def p01(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeExprs.ensureRegistered(spark)
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("norm", TextOps.normalize(col("text")))

    // 1. exact dedup, scoped per language — persisted: it feeds the
    // signature build, the verification shingles, and the survivor
    // anti-join (at cluster scale this is the staged intermediate table
    // a corpus run would materialize between stages)
    val exact = Dedup.exact(d, col("doc_id"),
      concat(col("lang"), lit("|"), TextOps.fingerprint(col("norm"))))
      .persistScoped()

    // 2a. signatures via the FUSED shingle-minhash expression — no
    // shingle strings materialize at signature time; persisted because
    // both band self-join sides read it (aliasing defeats exchange
    // reuse)
    val sigs = exact.select(col("doc_id"),
        call_function("graft_minhash32_w3",
          TextOps.tokens(col("norm"))).as("sig"))
      .persistScoped()
    val cand = Dedup.lshCandidatePairs(sigs, col("doc_id"), col("sig"), 8, 4)

    // 2b. exact verification of every candidate (sketches only GENERATE)
    // — shingle arrays are built ONLY for docs that appear in a
    // candidate pair (candidates << corpus at scale). Near-dup dedup is
    // scoped PER LANGUAGE like the exact stage — the d01 convention:
    // identical text under different language labels is two documents.
    val candDocs = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
      .join(exact.select(col("doc_id"), col("lang"), col("norm")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        TextOps.wordShingles(TextOps.tokens(col("norm")), 3).as("sh"))
      .persistScoped() // both verification sides
    val verified = cand
      .join(candDocs.select(col("doc_id").as("id_a"), col("lang").as("la"), col("sh").as("sa")), Seq("id_a"))
      .join(candDocs.select(col("doc_id").as("id_b"), col("lang").as("lb"), col("sh").as("sb")), Seq("id_b"))
      .filter(col("la") === col("lb"))
      .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.7)
      .select(col("id_a"), col("id_b"))

    // 2c. components → keep min-id representative per near-dup cluster
    val survivors = Dedup.dedupByPairs(exact, col("doc_id"), verified)

    // 3. quality scoring + filter (same features as t02)
    val scored = survivors
      .withColumn("n_chars_t", length(col("text")))
      .withColumn("n_toks", TextOps.tokenCount(col("text")))
      .withColumn("n_stop", TextOps.wordSetCount(TextOps.tokens(col("norm")), TextOps.EnStop))
      .withColumn("n_punct", TextOps.punctCount(col("text")))
      .withColumn("score", TextOps.qualityScore(
        col("n_chars_t"), col("n_toks"), col("n_stop"), col("n_punct")))
      .filter(col("score") >= 50)

    // 4. language-ID filter (same profiles + tie rule as t03): drop only
    // docs whose marker argmax CONFIDENTLY disagrees with the label —
    // 'und' (no marker evidence) passes through, as a real cleaning
    // pipeline would rather keep uncertain docs than lose them
    val withToks = scored.withColumn("toks", TextOps.tokens(col("norm")))
    val withScores = TextOps.LangMarkers.foldLeft(withToks) { case (df, (l, words)) =>
      df.withColumn(s"s_$l", TextOps.wordSetCount(col("toks"), words))
    }
    val kept = withScores.withColumn("predicted_lang",
        TextOps.predictLang(TextOps.LangMarkers.map { case (l, _) => l -> col(s"s_$l") }))
      .filter(col("predicted_lang") === col("lang") || col("predicted_lang") === "und")

    // 5. per-language stats, fixed-point mean
    kept.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        gf.dround(sum(gf.fixed(col("score"), 100.0)).cast("double") /
          count(lit(1)) / 100.0, 2).as("avg_score"))
      .orderBy(col("lang"))
  }

  /** p02 — deterministic token-budget sampling, the curation step after
    * cleaning: per language, take documents in md5-fingerprint order (a
    * deterministic, content-keyed "shuffle" — no RNG, stable across
    * runs/engines) until the running token count would exceed the
    * budget. Emits per-language sample stats.
    *
    * Scale note: this formulation sorts each language partition (one
    * window). At 100 TB the same semantics run as two passes — aggregate
    * tokens per hash-PREFIX bucket, pick the boundary bucket by
    * cumulative sum (tiny), then sort only the boundary bucket — but the
    * doc-level cutoff below is the semantics both share, and what the
    * oracle pins.
    */
  def p02(spark: SparkSession, dir: String): DataFrame = {
    val budget = 20000L // tokens per language
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("pick_key"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.load(spark, dir, "documents")
      .withColumn("norm", TextOps.normalize(col("text")))
      .select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).as("n_toks"),
        TextOps.fingerprint(col("norm")).as("pick_key"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= budget)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs_sampled"),
        sum(col("n_toks")).as("tokens_sampled"),
        max(col("cum_toks")).as("budget_used"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_corpus_clean" -> p01,
    "p02_token_budget" -> p02)

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val oracles: Map[String, String] = Map(
    "p01_corpus_clean" -> DuckSketchSql.p01,
    "p02_token_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    len(regexp_extract_all(text, '\\S+')) AS n_toks,
         |    md5($normSql) AS pick_key
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_toks,
         |    sum(n_toks) OVER (PARTITION BY lang ORDER BY pick_key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
         |  FROM d)
         |SELECT lang, count(*) AS n_docs_sampled,
         |  CAST(sum(n_toks) AS BIGINT) AS tokens_sampled,
         |  CAST(max(cum_toks) AS BIGINT) AS budget_used
         |FROM c WHERE cum_toks <= 20000 GROUP BY 1 ORDER BY lang""".stripMargin)
}
