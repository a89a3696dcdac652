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
    val one = df.groupBy().agg(aggs.head, aggs.tail: _*)
    checks.map { case (name, _) =>
      one.select(lit(name).as("check_name"), col("n_rows"),
        col(s"v_$name").as("n_violations"))
    }.reduce(_.unionByName(_))
  }

  /** Uniqueness check: rows whose key tuple occurs more than once all
    * count as violations.
    */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[Column]): DataFrame = {
    val dups = df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_violations"))
    df.groupBy().agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(dups))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
  }

  /** Referential-integrity check: child rows whose key has no match in
    * the parent key column (null child keys violate too — FK semantics
    * here are NOT NULL + EXISTS, the pipeline-audit reading).
    */
  def fkCheck(child: DataFrame, name: String, key: Column,
              parent: DataFrame, pkey: Column): DataFrame = {
    val orphans = child.select(key.as("_k"))
      .join(parent.select(pkey.as("_pk")).distinct(),
        col("_k") === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.groupBy().agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(orphans))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
  }

  /** Stack check results into the final audit report. */
  def report(results: Seq[DataFrame]): DataFrame =
    results.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
}
