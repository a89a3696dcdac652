package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy HINTS — the per-query override knob when a 100 TB
  * plan needs a different physical join than the size estimates pick
  * (a dimension the stats undercount, a shuffle-hash that beats SMJ on
  * a skew-free high-cardinality key, or suppressing a broadcast that
  * would OOM the driver). Asserted on the PRE-AQE physical plan — the
  * planner's selection is the unit under test; AQE re-planning honors
  * hints too but reads sizes at runtime.
  */
class JoinHintSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("join-hint-spec")

  private def fact = spark.range(20000)
    .select((col("id") % 100).as("k"), col("id").as("v"))
  private def dim = spark.range(50).select(col("id").as("k"), (col("id") * 7).as("w"))

  private def joinNode(df: DataFrame): String = {
    val p = df.queryExecution.sparkPlan.toString
    Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
      .filter(p.contains).mkString(",")
  }

  test("hints override the planner's join selection; results identical") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small dim auto-broadcasts by default...
      assert(joinNode(fact.join(dim, "k")) == "BroadcastHashJoin")
      // ...MERGE and SHUFFLE_HASH hints override it
      assert(joinNode(fact.join(dim.hint("merge"), "k")) == "SortMergeJoin")
      assert(joinNode(fact.join(dim.hint("shuffle_hash"), "k")) == "ShuffledHashJoin")
      // with broadcast disabled, the BROADCAST hint still forces it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(joinNode(fact.join(dim, "k")) != "BroadcastHashJoin")
      assert(joinNode(fact.join(broadcast(dim), "k")) == "BroadcastHashJoin")
      // the physical strategy never changes the answer
      val rows = Seq(
        fact.join(dim, "k"),
        fact.join(dim.hint("merge"), "k"),
        fact.join(dim.hint("shuffle_hash"), "k"),
        fact.join(broadcast(dim), "k")
      ).map(_.collect().map(_.toString).sorted.toSeq)
      assert(rows.distinct.size == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
