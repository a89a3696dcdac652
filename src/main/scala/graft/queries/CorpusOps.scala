package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{Decontam, TextOps}
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
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        TextOps.wordShingles(TextOps.tokens(TextOps.normalize($"text")), 4).as("ngs"))
    val train = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
      .withColumnRenamed("doc_id", "bench_id")
    Decontam.contaminationReport(train, "doc_id", bench, "bench_id", "ngs")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_decontaminate" -> c01
  )

  // wordShingles clamp semantics: a doc shorter than n tokens yields ONE
  // whole-text shingle — mirrored by greatest(len(toks)-(n-2), 2) range
  // bounds + DuckDB list-slice clamping (the proven d04 pattern).
  val oracles: Map[String, String] = Map(
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
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
  )
}
