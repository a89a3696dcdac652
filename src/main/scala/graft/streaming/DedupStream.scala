package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode}

/** One LSH-bucket member held in stream state: doc id + its full
  * MinHash signature (carried so the verification stage needs no join
  * back to a signature table — the same two-shuffles-saved shape as
  * the batch [[graft.operators.Dedup.lshCandidatePairsWithSigs]]).
  * TOP-LEVEL public case class: the state encoder Janino-compiles
  * against it (the InactivityAcc lesson — a nested class falls back
  * to interpreted projection per element).
  */
case class BucketMember(id: Long, sig: Array[Long])

/** STREAMING near-duplicate detection at INGEST (`transformWithState`)
  * — the live counterpart of the batch d02 MinHash+LSH pass: documents
  * arrive in micro-batches, each batch computes signatures + band keys
  * STATELESSLY (the same fused native MinHash the batch path uses),
  * and per band-bucket [[ListState]] holds every member seen so far —
  * a new arrival emits one candidate pair against each existing member
  * of its bucket, then joins the bucket. Dedup-at-ingest is what a
  * 100 TB training pipeline actually wants: each incoming document is
  * checked against the full accumulated corpus the moment it lands,
  * instead of re-running a corpus-wide self-join later.
  *
  * EXACT batch equivalence (what the d06 driver row proves): for every
  * unordered pair sharing a bucket, exactly one of the two arrives
  * later (in-batch ties broken by sorting arrivals on id), so the pair
  * emits exactly once per shared bucket — the batch LSH self-join
  * (`id_a < id_b` per band key) emits the same multiset, and after the
  * same `dropDuplicates(id_a, id_b)` the candidate SET is identical,
  * independent of micro-batch boundaries. The oracle is therefore
  * d02's DuckDB port VERBATIM.
  *
  * Scale shape: per-bucket work is quadratic in bucket size — inherent
  * to LSH candidate generation (the batch band self-join has the same
  * product) and governed by the band/row parameters, not the stream.
  * State per bucket is members × (8 B + signature), bounded by the
  * corpus itself; a production cap would stop pairing (and alert) on a
  * pathological hot bucket rather than grow O(n²) output.
  */
object DedupStream {

  /** One exploded (band, doc) arrival. */
  case class BandArrival(bandKey: Long, id: Long, sig: Array[Long])

  /** One candidate pair, signatures carried for batch-side Jaccard
    * estimation (stream and batch share one IEEE chain).
    */
  case class CandidatePair(id_a: Long, id_b: Long,
                           sig_a: Array[Long], sig_b: Array[Long])

  class LshDedupProcessor
      extends StatefulProcessor[Long, BandArrival, CandidatePair] {
    @transient private var members: ListState[BucketMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[BucketMember]("members",
        Encoders.product[BucketMember], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[BandArrival],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[CandidatePair] = {
      // in-batch arrival order is shuffle-nondeterministic — sort by id
      // so the emitted pair set never depends on task scheduling
      val arrived = rows.toArray.sortBy(_.id)
      val existing = scala.collection.mutable.ArrayBuffer.empty[BucketMember]
      members.get().foreach(existing += _)
      val out = Seq.newBuilder[CandidatePair]
      arrived.foreach { a =>
        existing.foreach { m =>
          if (m.id != a.id) {
            if (m.id < a.id) out += CandidatePair(m.id, a.id, m.sig, a.sig)
            else out += CandidatePair(a.id, m.id, a.sig, m.sig)
          }
        }
        val nm = BucketMember(a.id, a.sig)
        existing += nm
        members.appendValue(nm)
      }
      out.result().iterator
    }
  }

  /** Candidate near-dup pairs over a stream of exploded band arrivals;
    * pairs sharing several buckets emit once per bucket — apply the
    * same `dropDuplicates(id_a, id_b)` as the batch path downstream.
    */
  def candidatePairs(bands: Dataset[BandArrival]): Dataset[CandidatePair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bandKey)
      .transformWithState(new LshDedupProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
