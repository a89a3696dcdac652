package graft.tools

import graft.GraftSession
import graft.plans.SimilarityRewrite

/** Demo main for the similarity-join rewrite: runs the same naive
  * cosine-threshold SQL with the rule off (cartesian) and on
  * (LSH-bucketed hash join) and prints pair counts + plan evidence.
  */
object SimilarityDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("similarity-demo")
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val centers = Array.fill(6)(Array.fill(8)(rng.nextGaussian().toFloat))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat).toSeq)
    }
    vecs.toDF("id", "vec").createOrReplaceTempView("va")
    vecs.toDF("id", "vec").createOrReplaceTempView("vb")
    val q =
      """SELECT count(*) FROM va a JOIN vb b
        |ON a.id < b.id AND graft_cosine(a.vec, b.vec) > 0.95""".stripMargin
    val exact = spark.sql(q)
    println("EXACT_PAIRS=" + exact.head.getLong(0))
    println("EXACT_PLAN_CARTESIAN=" + {
      val p = exact.queryExecution.executedPlan.toString
      p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
    })
    spark.conf.set(SimilarityRewrite.PlanesConf, "2")
    val approx = spark.sql(q)
    println("REWRITTEN_PLAN_HAS_BUCKET=" +
      approx.queryExecution.executedPlan.toString.contains("graft_lsh_bucket"))
    println("APPROX_PAIRS=" + approx.head.getLong(0))
    spark.stop()
  }
}
