package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native mergeable AGGREGATE functions — the shape 100 TB tree
  * aggregation actually uses.
  *
  * The DataFrame-level sketches in `operators.Sketches` ([[graft.operators.Kmv]])
  * build a bottom-k sample with `orderBy(...).limit(k)` /
  * `row_number <= k` — fine for one global sketch or per-window lists,
  * but a per-GROUP sketch over billions of rows wants the sketch to BE
  * the aggregation buffer: each task folds its partition's rows into a
  * bounded buffer, the shuffle carries one ≤ k·8-byte buffer per
  * (group, task) instead of per-row hashes, and the final merge is a
  * bounded sorted-set union. That is exactly what
  * [[TypedImperativeAggregate]] gives: Spark plans it as a two-phase
  * ObjectHashAggregate (partial → shuffle of serialized buffers →
  * final merge), i.e. map-side combine of SKETCHES, not rows.
  *
  * Correctness hinges on the same property `Kmv.merge` pins: the mixed
  * hash is a bijection, so equal keys produce EQUAL hashes and the
  * buffer must dedup on insert — a sorted SET (not a heap of values)
  * makes update, merge, and duplicate-immunity one mechanism. Insertion
  * order cannot change the result (bottom-k of a set), so the aggregate
  * is parallelism- and partitioning-invariant bit-for-bit, which is why
  * the q72 driver row can be hash-compared against the DuckDB
  * `row_number() <= k` replay.
  */
object NativeAggs

/** Bottom-k distinct-hash (KMV) sketch as a typed imperative aggregate.
  *
  * Input: one signed `uh` long per row — the splitmix64-mixed key
  * XOR'd with Long.MinValue ([[graft.operators.Kmv.sketch]]'s
  * convention), so ascending SIGNED order ≡ unsigned hash order and the
  * natural `TreeSet[Long]` ordering is the sketch ordering. Rows need
  * NOT be pre-deduplicated: duplicate keys carry identical hashes and
  * the set absorbs them (`add` returns false — nothing is evicted).
  *
  * Output: the sketch as an ascending `array<long>` of at most `k`
  * hashes. A result with fewer than `k` entries IS the group's exact
  * distinct-hash set; downstream turns it into an estimate with
  * [[graft.operators.Kmv.estimate]] (`size` + `element_at(-1)`), the
  * same fixed IEEE chain the DuckDB oracles use.
  *
  * Cost: O(log k) per update (one `TreeSet` probe, early-rejected when
  * the value exceeds the current k-th hash of a full buffer), O(k log k)
  * per merge with an early break once the remaining donor values can no
  * longer displace anything. Buffers serialize as `size × 8` bytes.
  */
case class KmvAggExpr(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv aggregate needs k > 0, got $k")

  override def prettyName: String = "graft_kmv_agg"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_agg expects a BIGINT uh column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], uh: Long): Unit = {
    if (buf.size < k) { buf.add(uh); () }
    else if (uh < buf.last()) {
      // displaces the current k-th smallest — unless already present
      if (buf.add(uh)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var open = true
    while (open && it.hasNext) {
      val v = it.next()
      // donor iterates ascending: once a full buffer rejects one value,
      // every later donor value is larger and rejects too
      if (buf.size >= k && v >= buf.last()) open = false
      else insert(buf, v)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAggExpr =
    copy(child = newChild)
}

/** HyperLogLog register table (m = 256, p = 8) as one typed aggregate.
  *
  * Input: the splitmix64-MIXED key hash (`Hll.mix64Col`), one long per
  * row. Buffer: 256 bytes of per-register rho-max. Update is two bit
  * ops + a byte max; merge is a bytewise max — the HLL lattice law
  * GraftProps pins. Output: `array<int>` of 256 rho values (0 = never
  * hit), which `Hll.registersAgg` explodes back into the (j, rho_max)
  * register-table shape the existing exact-decimal estimate fold
  * consumes — h01's IEEE chain and oracle stay byte-identical.
  *
  * Why it exists next to the declarative `Hll.registers`: that form
  * shuffles |groups|·m register ROWS through two aggregations; this
  * ships ONE 256-byte buffer per (group, task) through a single
  * ObjectHashAggregate — at 100 TB the register build stops being a
  * second shuffle entirely.
  */
case class HllAggExpr(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val P = 8
  private val M = 1 << P
  private val RhoMax = 64 - P + 1 // 57

  override def prettyName: String = "graft_hll_agg"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hll_agg expects the mixed BIGINT hash, got ${child.dataType}")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h >>> (64 - P)).toInt
      val low = h & ((1L << (64 - P)) - 1)
      val rho =
        if (low == 0L) RhoMax
        else java.lang.Long.numberOfLeadingZeros(low) - P + 1
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(Array.tabulate(M)(i => buf(i).toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAggExpr =
    copy(child = newChild)
}

/** Count-Min counter matrix (3 × 1024) as one typed aggregate.
  *
  * Input: the `graft_hash64` item hash, one long per OCCURRENCE (CMS
  * counts multiplicity — unlike the two sketches above there is no
  * dedup). Each update increments `Depth` cells whose column indices
  * are the hash's consecutive 10-bit slices ([[graft.operators.CountMin.positions]]
  * verbatim). Merge is cell-wise addition — the lattice law GraftProps
  * pins for the declarative build. Output: the flat `array<long>` of
  * Depth·Width counters, row-major, which [[graft.operators.CountMin.buildAgg]]
  * explodes back into the (row, colm, cell) table the unchanged
  * `estimate` fold consumes — h03's min-over-rows and oracle stay
  * byte-identical.
  *
  * Why it exists next to the declarative build: that form explodes
  * Depth rows per occurrence and shuffles them into a (row, colm)
  * hash aggregation — 3× the corpus through an Exchange; this folds
  * every occurrence into a 24 KB buffer map-side and ships ONE buffer
  * per task. At 100 TB the counter build stops being a corpus-sized
  * shuffle entirely.
  */
case class CmsAggExpr(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Width = graft.operators.CountMin.Width
  private val Depth = graft.operators.CountMin.Depth

  override def prettyName: String = "graft_cms_agg"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cms_agg expects the BIGINT item hash, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < Depth) {
        buf(r * Width + ((h >>> (r * 10)) & (Width - 1)).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAggExpr =
    copy(child = newChild)
}

/** Fixed-range histogram (bins+2 counters: underflow, `bins` equal-width
  * bins over [lo, hi), overflow) as one typed aggregate — the
  * DISTRIBUTION member of the native-aggregate family (KMV =
  * distinctness, HLL = cardinality, CMS = frequency). Bin assignment is
  * exact integer arithmetic (`(v - lo) * bins / (hi - lo)`), merge is
  * cell-wise addition, so the whole sketch — and any quantile-edge
  * read off its cumulative sums — is bit-replayable in the DuckDB
  * oracle (h05). At 100 TB: one 8·(bins+2)-byte buffer per (group,
  * task) through ObjectHashAggregate where a percentile_approx would
  * ship variable-size digests and an exact percentile a full sort.
  */
case class HistAggExpr(
    child: Expression,
    lo: Long,
    hi: Long,
    bins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bins > 0 && hi > lo, s"hist aggregate needs bins > 0 and hi > lo, got [$lo,$hi)/$bins")

  override def prettyName: String = "graft_hist_agg"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hist_agg expects a BIGINT value column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  /** Bin index for an in-range value. `x - lo` and `hi - lo` are exact
    * as UNSIGNED 64-bit quantities whenever `lo <= x < hi` holds in
    * signed order (the wrap is mod 2^64 and the true difference is
    * < 2^64), so the fast path runs signed only when `hi - lo` did not
    * wrap AND `off * bins` cannot overflow; otherwise the slot is the
    * exact 128-bit floor(off * bins / span) over the unsigned values —
    * a mixed-sign or near-full-range [lo, hi) never wraps into a
    * negative (ArrayIndexOutOfBounds) or silently wrong bin.
    */
  private def slotOf(x: Long): Int = {
    val off = x - lo
    val span = hi - lo
    if (span > 0L && off <= Long.MaxValue / bins) 1 + (off * bins / span).toInt
    else {
      import java.math.BigInteger
      def ub(v: Long) = BigInteger.valueOf(v).and(HistAggExpr.Mask64)
      1 + ub(off).multiply(BigInteger.valueOf(bins)).divide(ub(span)).intValueExact()
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val slot =
        if (x < lo) 0
        else if (x >= hi) bins + 1
        else slotOf(x)
      buf(slot) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistAggExpr =
    copy(child = newChild)
}

object HistAggExpr {
  private[functions] val Mask64 =
    java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE)
}
