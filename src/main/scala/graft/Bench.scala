package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional name filter for local A/B profiling (the driver passes
    // no args — full suite); substring match, e.g. `runMain graft.Bench q69`
    def selected(name: String): Boolean =
      args.isEmpty || args.exists(name.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the ACTUAL plan shapes: run the whole suite once at the
    // smallest SF so JVM/codegen/compile cost lands here, not in the
    // first timed query (round 1: the alphabetically-first query
    // absorbed ~34 s of cold-start at sf0.1).
    val warmDir = {
      val d = new java.io.File("/root/testdata/sf0.001")
      if (d.isDirectory) d.getPath else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).foreach { case (_, fn) =>
        try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      }
    // clearCache releases persisted DataFrames but NOT localCheckpoint
    // RDD blocks (clusterPairs / k-means iterations) — drop those too or
    // they accumulate storage memory across the 48-query run.
    // INVARIANT this relies on: every timed iteration rebuilds its
    // DataFrames from source via fn(spark, sfDir) — no DataFrame
    // reference survives a dropCached() call, so unpersisting a
    // locally-checkpointed RDD (whose truncated lineage cannot be
    // recomputed) can never strand a consumer. Do not hoist query
    // results across iterations without revisiting this.
    def dropCached(): Unit = {
      QueryCaches.releaseAll() // drain the registry, not just the blocks
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // memoized BPE trainings would turn c20/c21's later reps into
      // cache reads — every timed rep must retrain
      graft.queries.CorpusOps.clearBpeCache()
      // checkpoint-part LRU: same rule — reps re-parse, not cache-read
      graft.sources.LakeLog.clearPartCache()
    }
    dropCached() // drop warmup persists before timing
    try graft.sources.Tables.names.foreach { n =>
      spark.read.parquet(graft.sources.Tables.path(sfDir, n)).limit(1).count()
    } catch { case _: Throwable => () }
    // Three timed reps per query, report the MEDIAN: a single local[32]
    // run shares the machine with whatever else is scheduled, and one
    // descheduling blip can inflate one query 10×+ (BENCH_r03 showed
    // s02 at 17 s vs a 1.1 s quiet-run median; the r05→r06 driver runs
    // differed 16% wholesale and 2× on z01 with byte-identical code).
    // The median rejects a single outlier in EITHER direction — min
    // could still reward one lucky fully-cached pass — so round-over-
    // round deltas are attributable to code, not load. Each rep still
    // pays its own persists (dropCached between reps).
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        dropCached()
        t
      }.sorted
      name -> reps(1) // median of 3
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
