package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Training-sequence packing: distribute documents into fixed-capacity
  * context windows ("bins" of `capacity` tokens) — the step between a
  * cleaned corpus and an LM training run, where short documents are
  * concatenated so each training sequence wastes as little of the
  * context window as possible.
  *
  * Rule: within each shard, documents are visited in (token-length
  * DESC, doc_id) order and packed NEXT-FIT — keep filling the current
  * bin until a document doesn't fit, then open a new one. A document
  * longer than `capacity` opens its own bin (upstream chunking — c07 —
  * is the operator that splits those). Next-fit (not best-fit) is the
  * deliberate choice: it is single-pass, needs O(1) state, and its
  * waste is bounded while remaining a pure function of the visit
  * order — so the whole assignment is DETERMINISTIC and replicable by
  * a sequential oracle.
  *
  * Distributed shape (the industrial one): packing is inherently
  * sequential, so the corpus is sharded (`doc_id % numShards`) and
  * each shard packs independently — one hash repartition + one
  * partition-local sort, then a single mapPartitions scan with O(1)
  * state per shard. No global sort, no driver loop; cross-shard waste
  * is at most one partial bin per shard. At 100 TB, numShards scales
  * with the cluster and each task streams its shard once.
  */
object Packing {

  /** One packed document: its shard, bin index within the shard, and
    * starting token offset within the bin.
    */
  case class Packed(doc_id: Long, shard: Long, bin: Long, start_tok: Long,
                    n_tokens: Long)

  /** Pack `docs` (columns `doc_id`, `n_tokens`) into bins of
    * `capacity` tokens, `numShards` independent shards.
    */
  def nextFitPack(docs: DataFrame, capacity: Long, numShards: Int): Dataset[Packed] = {
    require(capacity > 0 && numShards > 0, "need positive capacity and shards")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("n_tokens").cast("long"),
        (col("doc_id") % numShards).cast("long").as("shard"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards can hash into one partition; the sort keeps
        // each contiguous, so O(1) state resets at shard boundaries
        var curShard = Long.MinValue
        var bin = 0L
        var used = 0L
        it.map { case (id, len, shard) =>
          if (shard != curShard) { curShard = shard; bin = 0L; used = 0L }
          if (used > 0 && used + len > capacity) { bin += 1; used = 0L }
          val start = used
          used += len
          Packed(id, shard, bin, start, len)
        }
      }
  }
}
