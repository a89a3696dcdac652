package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("bucketing-spec")

  test("bucketed-bucketed join plans without an Exchange (co-located)") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    // clear table AND stale warehouse dirs from prior JVMs (the
    // in-memory catalog forgets them but the location survives)
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(a, "bkt_a", Seq("k"), 4)
    Bucketing.writeBucketed(b, "bkt_b", Seq("k"), 4)
    val joined = Bucketing.readTable(spark, "bkt_a")
      .join(Bucketing.readTable(spark, "bkt_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    // co-location: no shuffle on either side of the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in plan:\n$plan")
    assert(joined.count() == 1000)
    val r = joined.filter(col("k") === 7L).head
    assert(r.getAs[String]("va") == "a7" && r.getAs[Double]("vb") == 14.0)
  }
}
