package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SimilarityRewrite

/** The similarity-join rewrite: naive cosine-threshold cross join →
  * LSH-bucketed equi-join, opt-in, results ⊆ exact with high recall.
  */
class SimilarityRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("simrewrite-spec")

  def setup(): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // clustered vectors so real near-dup pairs exist
    val centers = Array.fill(6)(Array.fill(8)(rng.nextGaussian().toFloat))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat).toSeq)
    }
    vecs.toDF("id", "vec").createOrReplaceTempView("va")
    vecs.toDF("id", "vec").createOrReplaceTempView("vb")
  }

  val sql =
    """SELECT a.id AS ia, b.id AS ib
      |FROM va a JOIN vb b
      |  ON a.id < b.id AND graft_cosine(a.vec, b.vec) > 0.95""".stripMargin

  test("disabled by default: cartesian plan, exact results") {
    setup()
    spark.conf.unset(SimilarityRewrite.PlanesConf)
    val exact = spark.sql(sql)
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
    assert(exact.count() > 100) // clustered data has many close pairs
  }

  test("enabled: hash join on lsh buckets, high recall subset") {
    setup()
    spark.conf.unset(SimilarityRewrite.PlanesConf)
    val exact = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(SimilarityRewrite.PlanesConf, "2")
    try {
      val approxDf = spark.sql(sql)
      val plan = approxDf.queryExecution.executedPlan.toString
      assert(plan.contains("graft_lsh_bucket"), s"rewrite missing in:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected hash/SMJ join in:\n$plan")
      val approx = approxDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.subsetOf(exact)) // never invents pairs
      val recall = (approx & exact).size.toDouble / exact.size
      assert(recall > 0.5, s"recall=$recall") // 2 planes, tight clusters
    } finally spark.conf.unset(SimilarityRewrite.PlanesConf)
  }
}
