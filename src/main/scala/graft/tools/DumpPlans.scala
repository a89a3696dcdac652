package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, QueryCaches, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: write each query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence for
  * optimization rounds. Usage:
  *   runMain graft.tools.DumpPlans <sfDir> <outDir> <tag> [queryName ...]
  * (no names = every declared query).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, tag) = (args(0), args(1), args(2))
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local("graft-dumpplans")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      } catch {
        case e: Throwable =>
          Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"),
            s"EXPLAIN FAILED: ${e.getMessage}\n")
      } finally QueryCaches.releaseAll()
    }
    spark.stop()
  }
}
