package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontam, TextOps}

class DecontamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("decontam-spec")

  def ngrams(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ngs",
      TextOps.wordShingles(TextOps.tokens(TextOps.normalize(col("text"))), 3))

  test("planted benchmark span is flagged with exact overlap counts") {
    import spark.implicits._
    val bench = ngrams(Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bench_id", "text"))
    val train = ngrams(Seq(
      (1L, "a document containing the quick brown fox jumps verbatim inside it"),
      (2L, "completely unrelated words about ships and harbors and storms"),
      (3L, "the quick brown fox jumps over the lazy dog full copy here")
    ).toDF("doc_id", "text"))
    val got = Decontam.contaminationReport(train, "doc_id", bench, "bench_id", "ngs")
      .orderBy("doc_id").collect()
    // doc 2 shares no 3-gram → absent; docs 1 and 3 flagged
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val d1 = got(0)
    // doc 1 tokens: a document containing the quick brown fox jumps verbatim inside it
    // shared 3-grams: "the quick brown", "quick brown fox", "brown fox jumps" = 3
    assert(d1.getAs[Long]("n_hits") == 3L)
    assert(d1.getAs[Long]("n_bench_docs") == 1L)
    val d3 = got(1)
    // doc 3 contains the full benchmark sentence: all 7 benchmark 3-grams
    assert(d3.getAs[Long]("n_hits") == 7L)
  }

  test("duplicate n-grams across several benchmark docs count once per distinct gram") {
    import spark.implicits._
    val bench = ngrams(Seq(
      (100L, "alpha beta gamma delta"),
      (200L, "alpha beta gamma epsilon")).toDF("bench_id", "text"))
    val train = ngrams(Seq((1L, "prefix alpha beta gamma suffix")).toDF("doc_id", "text"))
    val r = Decontam.contaminationReport(train, "doc_id", bench, "bench_id", "ngs").head
    assert(r.getAs[Long]("n_hits") == 1L)       // "alpha beta gamma" once
    assert(r.getAs[Long]("n_bench_docs") == 2L) // but both bench docs hit
  }
}
