package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event log: for each user the
  * earliest stage-1 event, then the earliest stage-2 event STRICTLY
  * AFTER it, and so on — the standard strictly-sequential conversion
  * funnel (one event cannot satisfy two stages, re-orderings don't
  * count).
  *
  * Shape at scale: each stage is one filtered scan + hash min-aggregate
  * on user + one equi-join back to the (ever-shrinking) converted set —
  * no window over the whole log, no per-user event sort, stage count is
  * small and fixed. The event scan is re-read per stage with the stage
  * predicate pushed down (at 100 TB an event-type-partitioned layout
  * turns each into a partition-pruned read); users who never reached
  * stage k−1 are dropped from the stage-k join input, so later stages
  * touch strictly less data.
  */
object Funnel {

  /** Per-user stage times: (user, <stage1>_ts, …) with null once the
    * funnel is abandoned. `names` are the `kind` column's stage values
    * in funnel order.
    */
  def stages(events: DataFrame, user: String, ts: String, kind: String,
             names: Seq[String]): DataFrame = {
    require(names.nonEmpty, "need at least one funnel stage")
    def stageCol(s: String) = s"${s}_ts"
    // one pass over the event source: every per-stage filter below
    // reads this narrow materialized projection instead of re-scanning
    // the full event table once per stage
    import graft.QueryCaches.CacheOps
    val ev = events.filter(col(kind).isin(names: _*))
      .select(col(user), col(ts), col(kind)).persistScoped()
    var acc = ev.filter(col(kind) === names.head)
      .groupBy(col(user)).agg(min(col(ts)).as(stageCol(names.head)))
    for ((prev, s) <- names.zip(names.tail)) {
      val nxt = ev.filter(col(kind) === s)
        .join(acc.select(col(user), col(stageCol(prev)).as("_prev"))
          .filter(col("_prev").isNotNull), Seq(user))
        .filter(col(ts) > col("_prev"))
        .groupBy(col(user)).agg(min(col(ts)).as(stageCol(s)))
      acc = acc.join(nxt, Seq(user), "left")
    }
    acc
  }
}
