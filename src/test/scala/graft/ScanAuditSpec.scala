package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Column-pruning audit over the ENTIRE query suite — the scan-side
  * sibling of PlanAuditSpec's join audit: no query may read a wide
  * table's FULL column set unless the full set is semantically
  * required (allowlisted by query:table, each entry saying why). A
  * projection that silently stops reaching the parquet scan turns a
  * 2-column read into an 11-column read at 100 TB; this pins pruning
  * mechanically, by query name, for every current and future query.
  *
  * Scans are collected from `sparkPlan` (the pre-AQE physical tree —
  * pruning happens in the optimizer, so it is already final there;
  * `executedPlan`'s AQE wrapper is a leaf that `collect` cannot enter,
  * and its toString truncates long ReadSchemas). Scans hidden behind
  * persisted/checkpointed subtrees aren't visible — the vacuity test
  * below pins that the walker keeps seeing the direct-scan majority.
  */
class ScanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("scan-audit-spec")

  private val sfDir = "/root/testdata/sf0.001"

  /** Full physical widths of the tables wide enough to care about. */
  private val fullWidth = Map(
    "lineitem" -> 11, "orders" -> 6, "events" -> 6,
    "documents" -> 5, "customer" -> 5, "part" -> 6)

  /** query:table pairs where the full column set IS the semantics. */
  private val fullScanAllowed = Set(
    "q42_json_decode:events", // serializes every event field into the JSON payload
    "dq01_quality_audit:orders" // audits every column of the table by design
  )

  private val tableRe = """(\w+)\.parquet""".r

  private def scansOf(name: String): Seq[(String, Int)] =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        val path = f.relation.location.rootPaths.headOption.fold("")(_.toString)
        val table = tableRe.findFirstMatchIn(path).fold("?")(_.group(1))
        (table, f.requiredSchema.fields.length)
    }

  test("no query reads a wide table's full column set without cause") {
    assume(new java.io.File(sfDir).isDirectory)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      for ((table, cols) <- scansOf(name); w <- fullWidth.get(table))
        if (cols >= w && !fullScanAllowed(s"$name:$table"))
          offenders += s"$name:$table reads all $w columns"
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    assert(offenders.isEmpty, offenders.distinct.mkString("\n"))
  }

  test("the walker actually sees scans (no silent vacuous pass)") {
    assume(new java.io.File(sfDir).isDirectory)
    // q01 reads 5 of lineitem's 11 columns — both the sighting and the
    // pruned width are pinned, so a parser regression fails loudly here
    assert(scansOf("q01_pricing_summary").contains(("lineitem", 5)))
  }
}
