package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Pipeline

/** End-to-end corpus-clean pipeline on a designed fixture: every stage
  * must claim exactly its intended victims — exact copy, near-dup,
  * low-quality junk, confidently-mislabeled doc — and nothing else.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("pipeline-spec")

  private val goodEn =
    "the project report and the cost summary of the delivery is ready to read " +
      "and the board is happy with the outcome of the quarter and the plan is to continue"
  private val goodDe =
    "der bericht und die zusammenfassung der kosten ist fertig und der vorstand ist " +
      "zufrieden mit dem ergebnis und der plan ist die fortsetzung der arbeit im jahr"

  private def writeFixture(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipe-fixture").toString
    val docs = Seq(
      (1L, "en", goodEn),                       // survives everything
      (2L, "en", goodEn),                       // exact copy → dropped at stage 1
      (3L, "en", goodEn.dropRight(12)),         // near-dup → dropped at stage 2
      (4L, "en", "x y."),                       // junk → dropped at stage 3 (score < 50)
      (5L, "en", goodDe),                       // labeled en, confidently de → dropped at stage 4
      (6L, "de", goodDe))                       // survives everything
      .toDF("doc_id", "lang", "text")
    docs.write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("each pipeline stage drops exactly its planted victim") {
    val out = Pipeline.p01(spark, writeFixture()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("en" -> 1L, "de" -> 1L), s"got $out")
  }

  test("stats are computed over survivors only") {
    val rows = Pipeline.p01(spark, writeFixture()).collect()
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("total_tokens") == goodEn.split("\\s+").length)
    assert(en.getAs[Double]("avg_score") >= 50.0)
  }
}
