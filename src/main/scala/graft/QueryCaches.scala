package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame

/** Build-scoped cache registry — the cache-hygiene contract between
  * query builders and query runners.
  *
  * Query builders persist frames that several plan branches re-read
  * (ANN sides, signature tables, tokenized scans) via
  * [[QueryCaches.persistScoped]]; every runner (Verify, Bench, the
  * suite specs) calls [[releaseAll]] after materializing a query, so
  * no `.persist()` outlives the run that needed it — a long-lived
  * session no longer accumulates pinned blocks. SparkEntrySpec
  * asserts the contract mechanically: after each query's build+run+
  * release, no plain-persisted RDDs may remain (`localCheckpoint`ed
  * small frames are exempt — they are bounded by construction and
  * reclaimed by the ContextCleaner when unreferenced).
  *
  * Registered frames stay ordinary persists rather than
  * localCheckpoints so the full logical plan stays declarative —
  * ScanAuditSpec / PlanAuditSpec audit pruning and join shapes THROUGH
  * them. At 100 TB these frames are the ones a production pipeline
  * would stage as tables between jobs; in-session caching is the
  * single-job analog.
  *
  * CONCURRENCY CONTRACT: the registry is ONE process-global queue, so
  * build→run→releaseAll cycles must not overlap within a JVM — a
  * concurrent runner's releaseAll() would unpersist frames another
  * query is still computing over (silent recompute, not wrong
  * answers). Every current runner honors this: Verify and Bench are
  * strictly sequential, and sbt's forked test JVM runs suites (and the
  * query-driving loops inside them) sequentially — no two
  * build→release cycles ever overlap.
  * If a future runner needs intra-JVM parallelism, hand each run its
  * own scope (a token carrying its own queue) instead of this object.
  */
object QueryCaches {

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for post-run release. */
  def register(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Unpersist every registered frame (idempotent, non-blocking). */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  implicit class CacheOps(private val df: DataFrame) extends AnyVal {
    /** `.persist()` that a runner's [[releaseAll]] will release. */
    def persistScoped(): DataFrame = register(df)
  }
}
