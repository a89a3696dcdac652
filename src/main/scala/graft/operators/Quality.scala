package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the constraint-check pass a
  * production pipeline runs before trusting a table (the Deequ idea,
  * re-expressed as plain aggregates).
  *
  * Every check compiles into the SAME scan: row-predicate checks are
  * conditional counts fused into one aggregation (one pass over the
  * table regardless of how many checks), uniqueness is one hash
  * aggregate, referential integrity is one anti-join with the parent
  * key set (broadcast when small, shuffle otherwise — Catalyst's
  * call). Output is one row per check: (check_name, n_rows,
  * n_violations, pass) — deterministic integers, trivially
  * oracle-able.
  */
object Quality {

  /** Fused row-predicate audit: each (name, violationPredicate) pair
    * becomes a conditional count in ONE aggregation over `df`.
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (name, bad) =>
        count(when(bad, lit(1))).as(s"v_$name")
      }
    // localCheckpoint: the per-check union branches below each re-plan
    // this subtree — without it the "one pass" promise silently becomes
    // |checks| full passes over df (observed: dq01's plan held 3
    // independent scans of the same union)
    val one = df.groupBy().agg(aggs.head, aggs.tail: _*).localCheckpoint()
    checks.map { case (name, _) =>
      one.select(lit(name).as("check_name"), col("n_rows"),
        col(s"v_$name").as("n_violations"))
    }.reduce(_.unionByName(_))
  }

  /** Uniqueness check: rows whose key tuple occurs more than once all
    * count as violations.
    */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[Column]): DataFrame =
    // ONE pass: total rows = Σ group counts, violations = Σ counts of
    // groups seen more than once — the separate full count(*) scan the
    // old two-frame shape ran is pure arithmetic over the same groups
    df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  /** Referential-integrity check: child rows whose key has no match in
    * the parent key column (null child keys violate too — FK semantics
    * here are NOT NULL + EXISTS, the pipeline-audit reading).
    */
  def fkCheck(child: DataFrame, name: String, key: Column,
              parent: DataFrame, pkey: Column): DataFrame =
    // ONE pass over the child: the anti-join + separate count(*) pair
    // becomes a left join against the deduplicated parent keys (no
    // fan-out possible) counting rows and unmatched rows together.
    // Null child keys never match — still violations, as before.
    child.select(key.as("_k"))
      .join(parent.select(pkey.as("_pk")).distinct(),
        col("_k") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("_pk").isNull, lit(1))).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  /** Stack check results into the final audit report. */
  def report(results: Seq[DataFrame]): DataFrame =
    results.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
}
