package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of d01's plan pieces. */
object ProfileD01 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("profile-d01")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    spark.range(100000).selectExpr("id % 7 AS k").groupBy("k").count().collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan only")(docs.count())
    time("scan again (cached fs)")(docs.count())
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    time("md5(norm) project")(docs.select(md5(norm).as("f")).count())
    val all = docs.select(col("doc_id"), col("lang"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("lang"), col("text")))
    time("union + md5")(all.select(md5(norm).as("f")).count())
    val fp = concat(col("lang"), lit("|"), md5(norm))
    time("groupBy fp count only")(
      all.groupBy(fp.as("f")).agg(count(lit(1))).count())
    time("groupBy fp + min_by(struct)")(
      all.groupBy(fp.as("f"))
        .agg(min_by(struct(col("doc_id"), col("lang"), col("text")), col("doc_id")),
          count(lit(1))).count())
    time("full d01")(graft.queries.DataOps.d01(spark, dir).count())
    time("full d01 again")(graft.queries.DataOps.d01(spark, dir).count())
    spark.stop()
  }
}
