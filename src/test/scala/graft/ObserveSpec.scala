package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` — the zero-extra-scan pipeline-metrics surface
  * (row counts / checksums ride the SAME pass as the real work, where a
  * separate `count()` would re-scan 100 TB). Metrics are exact integer
  * aggregates here, so the observed values are asserted equal to an
  * independent aggregation, not just present.
  */
class ObserveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("observe-spec")

  test("observe delivers exact counts/sums on the work's own pass") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val got = new java.util.concurrent.atomic.AtomicReference[Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get("ingest_stats").foreach(got.set)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val o = graft.sources.Tables.load(spark, sfDir, "orders")
      val observed = o.observe("ingest_stats",
        count(lit(1)).as("n_rows"),
        sum(graft.functions.gf.fixed(col("o_totalprice"), 100)).as("cents"),
        max(col("o_orderkey")).as("max_key"))
      // the "real work": an unrelated aggregate consuming the frame
      val distinctPrio = observed.select(col("o_orderpriority")).distinct().count()
      assert(distinctPrio > 0)
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (got.get() == null && System.nanoTime() < deadline) Thread.sleep(50)
      val m = got.get()
      assert(m != null, "observed metrics never arrived")
      val exact = o.agg(count(lit(1)), sum(graft.functions.gf.fixed(
        col("o_totalprice"), 100)), max(col("o_orderkey"))).head()
      assert(m.getLong(0) == exact.getLong(0))
      assert(m.getLong(1) == exact.getLong(1))
      assert(m.getLong(2) == exact.getLong(2))
    } finally spark.listenerManager.unregister(listener)
  }
}
