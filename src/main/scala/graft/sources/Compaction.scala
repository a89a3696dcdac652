package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lake-maintenance operator every
  * long-running parquet warehouse needs: streaming sinks and
  * fine-grained partition writes accumulate files far below the
  * HDFS-block / scan-granule sweet spot, and at 100 TB the resulting
  * task-per-tiny-file scheduling overhead dominates scans.
  *
  * Sizing comes from the FILE SYSTEM (one `getContentSummary` call),
  * not from scanning the data: partition count =
  * max(1, ceil(inputBytes / targetBytes)), so the rewrite is a single
  * read→redistribute→write pass sized before any job runs.
  *
  * Redistribution mode matters at scale:
  *   - `shuffle = false` uses `coalesce`: NO shuffle — upstream
  *     partitions are merged in place. The right default for the
  *     many-small-files case (compaction's raison d'être). `coalesce`
  *     can only MERGE, never split — so when the computed target
  *     exceeds the scan's partition count (a few oversized files that
  *     need splitting), the shuffle-free path cannot honour
  *     `targetBytes` and the code auto-switches to `repartition`;
  *   - `shuffle = true` uses `repartition`: one full shuffle, but the
  *     output files are balanced even when input files are skewed
  *     (coalesce merges neighbors and inherits their imbalance).
  */
object Compaction {

  /** Compact `inDir` (parquet) into `outDir` targeting `targetBytes`
    * per output file. Returns (partitions written, input bytes).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              shuffle: Boolean = false): (Int, Long) = {
    require(targetBytes > 0, "need targetBytes > 0")
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    // coalesce only merges: splitting few-giant-files into `parts`
    // pieces needs the shuffle path even when the caller didn't ask.
    val mustSplit = parts > df.rdd.getNumPartitions
    val sized =
      if (shuffle || mustSplit) df.repartition(parts) else df.coalesce(parts)
    sized.write.mode("overwrite").parquet(outDir)
    (parts, bytes)
  }
}
