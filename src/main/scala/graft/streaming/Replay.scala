package graft.streaming

import org.apache.spark.sql.DataFrame

/** File-replay slice writer for the streaming driver rows (q48/q53/
  * q56/q69): each slice lands as one parquet file in `dir`, and every
  * slice's data files get EXPLICIT, strictly-increasing modification
  * times. `FileStreamSource` orders files by mtime with a
  * nondeterministic tie-break, so on a coarse-mtime filesystem two
  * sequential `coalesce(1)` writes can land in the same granule and be
  * read out of order — a sentinel read early jumps the watermark and
  * drops deferred slices. Stamping makes replay order a property of
  * the slice index, not of filesystem timestamp resolution.
  */
object Replay {

  /** 2000-01-01 UTC — far below any real build-time mtime, so a file
    * whose mtime exceeds `StampBase + one day` is necessarily from the
    * write that just finished (not a previously stamped slice).
    */
  private val StampBase = 946684800000L

  def writeSlices(dir: String, slices: Seq[DataFrame]): Unit = {
    val d = new java.io.File(dir)
    slices.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write
        .mode(if (i == 0) "overwrite" else "append").parquet(dir)
      d.listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.lastModified() > StampBase + 86400000L)
        .foreach { f =>
          if (!f.setLastModified(StampBase + i * 60000L))
            throw new IllegalStateException(
              s"Replay.writeSlices: cannot stamp mtime on $f")
        }
    }
  }
}
