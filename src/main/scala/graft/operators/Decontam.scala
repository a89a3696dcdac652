package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Benchmark decontamination: flag training documents sharing word
  * n-grams with a benchmark/eval set — the standard pre-training
  * hygiene pass (the published recipe: 8–13-gram overlap against the
  * eval suites; n scales with document length).
  *
  * Scale shape: both sides explode their distinct n-grams and meet in
  * ONE equi-join keyed on a 64-bit n-gram hash, with string equality
  * confirmed post-join — the hash key keeps the shuffle narrow and
  * uniformly distributed, the string check makes the result exactly
  * the set-overlap semantics (zero collision risk), so the DuckDB
  * oracle can join on raw strings. The benchmark side is tiny relative
  * to the corpus (eval suites vs 100 TB), so the join broadcasts; the
  * per-document aggregate is one hash aggregation on doc id.
  */
object Decontam {

  /** Per-training-doc contamination report. `train`/`bench` must carry
    * (`idCol` / `benchIdCol`, `ngramCol`: array<string> of DISTINCT
    * n-grams, e.g. [[TextOps.wordShingles]]). Output (one row per
    * contaminated doc): idCol, n_ngrams, n_hits (distinct n-grams also
    * present in ANY benchmark doc), contaminated_frac (4dp),
    * n_bench_docs (distinct benchmark docs hit).
    */
  def contaminationReport(train: DataFrame, idCol: String,
                          bench: DataFrame, benchIdCol: String,
                          ngramCol: String): DataFrame = {
    val tEx = train.select(col(idCol),
        size(col(ngramCol)).cast("long").as("n_ngrams"),
        explode(col(ngramCol)).as("ng"))
      .withColumn("__h", xxhash64(col("ng")))
    val bEx = bench.select(col(benchIdCol).as("__bench_id"),
        explode(col(ngramCol)).as("__bng"))
      .withColumn("__h", xxhash64(col("__bng")))
    tEx.join(bEx, Seq("__h"))
      .filter(col("ng") === col("__bng"))
      .groupBy(col(idCol))
      .agg(max(col("n_ngrams")).as("n_ngrams"),
        countDistinct(col("ng")).as("n_hits"),
        countDistinct(col("__bench_id")).as("n_bench_docs"))
      .select(col(idCol), col("n_ngrams"), col("n_hits"),
        gf.dround(col("n_hits").cast("double") / col("n_ngrams"), 4)
          .as("contaminated_frac"),
        col("n_bench_docs"))
  }
}
