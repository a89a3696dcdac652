package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WindowOps

class WindowOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("windowops-spec")

  test("growthStreaks: islands reset on non-growth, start is min key") {
    import spark.implicits._
    // values: 1,2,3 (streak 2: months 2,3), 2 (reset), 5,6 (streak 2: 5,6)
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
      ("a", 4, 20), ("a", 5, 50), ("a", 6, 60)).toDF("e", "ym", "cnt")
    val s = WindowOps.growthStreaks(df, Seq(col("e")), col("ym"), col("cnt"))
      .orderBy("streak_start").collect()
    assert(s.map(r => (r.getAs[Long]("streak_len"), r.getAs[Int]("streak_start")))
      .toSeq == Seq((2L, 2), (2L, 5)))
  }

  test("growthStreaks: strictly-equal values do not extend a streak") {
    import spark.implicits._
    val df = Seq(("a", 1, 10), ("a", 2, 10), ("a", 3, 11)).toDF("e", "ym", "cnt")
    val s = WindowOps.growthStreaks(df, Seq(col("e")), col("ym"), col("cnt")).collect()
    assert(s.map(_.getAs[Long]("streak_len")).toSeq == Seq(1L))
  }

  test("movingMeanFixed: 3-row window, partial frames at partition head") {
    import spark.implicits._
    val df = Seq(("a", 1, 100L), ("a", 2, 200L), ("a", 3, 300L), ("a", 4, 400L))
      .toDF("e", "t", "vf") // fixed-point at scale 100 → 1.00, 2.00, 3.00, 4.00
    val got = df.withColumn("m",
        WindowOps.movingMeanFixed(col("vf"), Seq(col("e")), Seq(col("t")), 3, 100.0))
      .orderBy("t").collect().map(_.getAs[Double]("m"))
    assert(got.toSeq == Seq(1.0, 1.5, 2.0, 3.0))
  }

  test("dualRank: opposite orderings share partition") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 3.0), ("c", 2.0)).toDF("k", "v")
    val got = WindowOps.dualRank(df, Seq.empty, col("v"))
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Int]("rank_best"), r.getAs[Int]("rank_worst")))
    assert(got.toSeq == Seq(("a", 3, 1), ("b", 1, 3), ("c", 2, 2)))
  }

  test("topKPerGroup: rank semantics keep ties, k bound respected") {
    import spark.implicits._
    val df = Seq(("g", "x", 5.0), ("g", "y", 5.0), ("g", "z", 1.0)).toDF("g", "id", "v")
    // ties on v broken by id → deterministic; k=1 keeps exactly one
    val got = WindowOps.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), 1).collect()
    assert(got.map(_.getAs[String]("id")).toSeq == Seq("x"))
  }
}
