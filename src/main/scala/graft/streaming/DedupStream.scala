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
  * corpus itself — UP TO the hot-bucket cap: a bucket reaching
  * [[DedupStream.DefaultBucketCap]] members is POISONED. Pairing (and
  * state growth) stops for it, and every refused arrival emits a
  * poisoned-bucket record instead — a LOUD, countable signal (also
  * surfaced as the `poisoned_arrivals` observed metric), never a
  * silent drop. Pairs emitted while the bucket was below the cap all
  * stand. A poisoned bucket means the banding parameters are wrong
  * for the corpus (or a degenerate key swallowed it) — the operator's
  * fix is re-banding, not unbounded O(n²) output.
  */
object DedupStream {

  /** Per-bucket member cap before the bucket poisons. Quadratic pair
    * output at the cap (~8M pairs) is the alarm threshold, not a
    * normal operating point — real LSH buckets at sane band/row
    * parameters hold a handful of near-duplicates.
    */
  val DefaultBucketCap = 4096

  /** Session-conf key for the cap — the per-QUERY surface (banding
    * parameters vary per corpus, so the right cap does too; a global
    * constant would force one alarm threshold on every stream). Read
    * once at stream construction; the `poisoned_arrivals` metric name
    * is stable regardless of the cap's origin.
    */
  val BucketCapConf = "graft.dedup.bucket_cap"

  /** The cap for this session: `graft.dedup.bucket_cap` if set (must
    * be positive), else [[DefaultBucketCap]].
    */
  def configuredCap(spark: org.apache.spark.sql.SparkSession): Int = {
    val cap = spark.conf.getOption(BucketCapConf)
      .map(_.toInt).getOrElse(DefaultBucketCap)
    require(cap > 0, s"$BucketCapConf must be positive, got $cap")
    cap
  }

  /** One exploded (band, doc) arrival. */
  case class BandArrival(bandKey: Long, id: Long, sig: Array[Long])

  /** One candidate pair, signatures carried for batch-side Jaccard
    * estimation (stream and batch share one IEEE chain).
    */
  case class CandidatePair(id_a: Long, id_b: Long,
                           sig_a: Array[Long], sig_b: Array[Long])

  /** Processor output: a candidate pair (`poisoned_band` empty), or a
    * poisoned-bucket record — `poisoned_band` = the hot bucket's key,
    * `id_a` = the refused arrival, `id_b` = the frozen bucket size.
    */
  case class LshEvent(id_a: Long, id_b: Long,
      sig_a: Array[Long], sig_b: Array[Long], poisoned_band: Option[Long])

  class LshDedupProcessor(maxBucketMembers: Int)
      extends StatefulProcessor[Long, BandArrival, LshEvent] {
    @transient private var members: ListState[BucketMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[BucketMember]("members",
        Encoders.product[BucketMember], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[BandArrival],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[LshEvent] = {
      // in-batch arrival order is shuffle-nondeterministic — sort by id
      // so the emitted pair set never depends on task scheduling
      val arrived = rows.toArray.sortBy(_.id)
      val existing = scala.collection.mutable.ArrayBuffer.empty[BucketMember]
      members.get().foreach(existing += _)
      val out = Seq.newBuilder[LshEvent]
      arrived.foreach { a =>
        if (existing.size >= maxBucketMembers) {
          // POISONED: capped work, loud signal — one record per
          // refused arrival; state stays frozen at the cap
          out += LshEvent(a.id, existing.size.toLong, null, null, Some(key))
        } else {
          existing.foreach { m =>
            if (m.id != a.id) {
              if (m.id < a.id) out += LshEvent(m.id, a.id, m.sig, a.sig, None)
              else out += LshEvent(a.id, m.id, a.sig, m.sig, None)
            }
          }
          val nm = BucketMember(a.id, a.sig)
          existing += nm
          members.appendValue(nm)
        }
      }
      out.result().iterator
    }
  }

  /** The raw event stream: candidate pairs + poisoned-bucket records
    * (the side channel a production ingest monitors and alerts on).
    */
  def events(bands: Dataset[BandArrival],
      maxBucketMembers: Int = DefaultBucketCap): Dataset[LshEvent] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bandKey)
      .transformWithState(new LshDedupProcessor(maxBucketMembers),
        TimeMode.None(), OutputMode.Append())
  }

  /** Candidate near-dup pairs over a stream of exploded band arrivals;
    * pairs sharing several buckets emit once per bucket — apply the
    * same `dropDuplicates(id_a, id_b)` as the batch path downstream.
    * Hot-bucket refusals surface per micro-batch as the
    * `poisoned_arrivals` observed metric (StreamingQueryProgress
    * `observedMetrics("lsh_dedup")`) — never a silent drop.
    */
  def candidatePairs(bands: Dataset[BandArrival],
      maxBucketMembers: Int = DefaultBucketCap): Dataset[CandidatePair] = {
    import bands.sparkSession.implicits._
    import org.apache.spark.sql.functions.{count, when, col}
    events(bands, maxBucketMembers)
      .observe("lsh_dedup",
        count(when(col("poisoned_band").isNotNull, 1)).as("poisoned_arrivals"))
      .filter(_.poisoned_band.isEmpty)
      .map(e => CandidatePair(e.id_a, e.id_b, e.sig_a, e.sig_b))
  }
}
