package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time one or more SparkEntry queries repeatedly.
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <reps> <query...>
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val spark = GraftSession.builder("graft-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.drop(2); q = SparkEntry.queries(name)) {
      q(spark, dir).count() // warm plan/codegen
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      val sorted = times.sorted
      val median = // true median: average the two middle samples for even reps
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      println(f"[profile] $name%-28s median=$median%.3f " +
        f"min=${times.min}%.3f max=${times.max}%.3f")
    }
    spark.stop()
  }
}
