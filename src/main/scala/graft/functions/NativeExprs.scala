package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot sketching loops.
  *
  * Array higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambdas interpreted — fine for dozens of elements, but
  * a MinHash over s shingles × p permutations is s·p lambda dispatches
  * PER ROW. These expressions run the whole sketch as one tight JVM loop
  * per row instead (~10× on the documents corpus).
  *
  * [[DotFixedExpr]] carries real `doGenCode` (single branch-free loop
  * spliced into WholeStageCodegen). The sketching expressions use
  * `CodegenFallback` deliberately: their cost is the internal loop, not
  * the per-row dispatch, and fallback keeps them robust while the
  * surrounding projection still codegens.
  *
  * Hashing is self-contained (FNV-1a over UTF-8 bytes + splitmix64
  * finalizer) — deterministic across runs, executors, and Spark
  * versions, with no dependency on Spark-internal hash utilities.
  */
object NativeExprs {

  @inline final def mix64(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  @inline final def hashUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    var h = -3750763034362895579L // FNV-1a 64 offset basis
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    mix64(h)
  }

  val PermSeed: Long = -5840758589994634535L

  /** (name, builder) for every native function. Single source of truth
    * for [[register]] and `GraftExtensions`.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash32" -> (exprs => MinHashSigExpr(exprs.head, 32)),
    "graft_minhash32_w3" -> (exprs => MinHashShingledExpr(exprs.head, k = 3, numHashes = 32)),
    "graft_simhash64" -> (exprs => SimHash64Expr(exprs.head)),
    "graft_dot_fixed" -> (exprs => DotFixedExpr(exprs.head, exprs(1))),
    "graft_winnow" -> (exprs => WinnowExpr(exprs.head, k = 8, w = 6)),
    "graft_word_count" -> (exprs => WordSetCountExpr(exprs.head, exprs(1))),
    "graft_hash64" -> (exprs => Hash64Expr(exprs.head)),
    "graft_hilbert_d2" -> (exprs => HilbertD2Expr(exprs.head, exprs(1))),
    "graft_word_shingles" -> (exprs => WordNgramsExpr(exprs.head,
      literalInt(exprs(1)), distinct = true, clampShort = true)),
    "graft_word_ngrams_all" -> (exprs => WordNgramsExpr(exprs.head,
      literalInt(exprs(1)), distinct = false, clampShort = false)),
    "graft_bpe_merge" -> (exprs => BpeMergeExpr(exprs.head, exprs(1), exprs(2))),
    "graft_bpe_apply" -> (exprs => BpeApplyExpr(exprs.head, exprs(1), exprs(2))),
    "graft_kmv_agg" -> (exprs => KmvAggExpr(exprs.head, literalInt(exprs(1)))),
    "graft_hll_agg" -> (exprs => HllAggExpr(exprs.head)),
    "graft_cms_agg" -> (exprs => CmsAggExpr(exprs.head)),
    "graft_hist_agg" -> (exprs => HistAggExpr(exprs.head,
      literalLong(exprs(1)), literalLong(exprs(2)), literalInt(exprs(3)))))

  private def literalInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal int argument, got $e")
    e.eval(null) match {
      case i: Int => i
      case other => other.toString.toInt
    }
  }

  private def literalLong(e: Expression): Long = {
    require(e.foldable, s"expected a literal long argument, got $e")
    e.eval(null) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => other.toString.toLong
    }
  }

  /** Alias for [[register]] kept for call-site clarity: queries handed
    * an arbitrary session (the driver's mains) call this; sessions
    * built with GraftExtensions already have every function and the
    * call is a no-op.
    */
  def ensureRegistered(spark: SparkSession): Unit = register(spark)

  /** Register any MISSING native functions for `call_function` use.
    * Per-function idempotent — never replaces, so no replaced-function
    * warnings when some functions already exist.
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** MinHash signature: array<string> shingles → array<long> of `numHashes`
  * minima, permutation i = splitmix remix of the base hash with seed·i.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = NativeExprs.hashUtf8(arr.getUTF8String(j))
        var i = 0
        while (i < numHashes) {
          val m = NativeExprs.mix64(h + NativeExprs.PermSeed * i)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Fused word-shingle MinHash: array<string> tokens → the SAME
  * signature as `MinHashSigExpr(wordShingles(toks, k))`, computed
  * without materializing any shingle string — the FNV-1a state streams
  * over the k member tokens' bytes with a single separator byte between
  * them, exactly as hashing the space-joined shingle would. Duplicate
  * shingles can't change a min, so skipping the distinct step is
  * semantics-neutral. At corpus scale this removes the dominant
  * allocation cost of signature building (shingle strings existed only
  * to be hashed).
  */
case class MinHashShingledExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_shingled"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tokBytes = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      tokBytes(j) = if (arr.isNullAt(j)) Array.emptyByteArray
                    else arr.getUTF8String(j).getBytes
      j += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val numShingles = math.max(n - (k - 1), 1)
    var s = 0
    while (s < numShingles) {
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      val end = math.min(s + k, n)
      var t = s
      var emitted = false
      while (t < end) {
        // null tokens are SKIPPED entirely, joiner included — matching
        // concat_ws, which drops nulls (window positions still advance)
        if (!arr.isNullAt(t)) {
          if (emitted) h = (h ^ 0x20L) * 1099511628211L // the ' ' joiner
          emitted = true
          val b = tokBytes(t)
          var i = 0
          while (i < b.length) {
            h = (h ^ (b(i) & 0xffL)) * 1099511628211L
            i += 1
          }
        }
        t += 1
      }
      val base = NativeExprs.mix64(h)
      var i = 0
      while (i < numHashes) {
        val m = NativeExprs.mix64(base + NativeExprs.PermSeed * i)
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingledExpr =
    copy(child = newChild)
}

/** SimHash: array<string> tokens → 64-bit majority-vote fingerprint. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = NativeExprs.hashUtf8(arr.getUTF8String(j))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD
  * '03): rolling-hash every k-gram, then keep the minimum hash of each
  * w-length window of consecutive k-gram hashes (rightmost min on
  * ties), deduplicated. Guarantees any shared substring of length
  * ≥ w+k−1 contributes a shared fingerprint — the standard
  * plagiarism/near-dup fingerprint with output size ~2/(w+1) of the
  * text. One tight loop per row; the k-gram hash is genuinely rolling
  * (O(1) per step via the precomputed B^(k-1) factor).
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  private val B = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    grams(0) = NativeExprs.mix64(h)
    i = 1
    while (i <= n - k) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * B + (bytes(i + k - 1) & 0xffL)
      grams(i) = NativeExprs.mix64(h)
      i += 1
    }
    // winnow: min of each w-window of gram hashes, rightmost on ties
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    val m = grams.length
    var start = 0
    while (start <= m - w || (m < w && start == 0)) {
      val end = math.min(start + w, m)
      var best = grams(start)
      var j = start + 1
      while (j < end) { if (grams(j) <= best) best = grams(j); j += 1 }
      out += best
      start += 1
      if (m < w) start = m // single short window
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** Count of tokens present in a STATIC word set: array<string> tokens ×
  * foldable array<string> words → int. The words literal is evaluated
  * once into a hash set at first use; each row is then one tight loop
  * with O(1) membership tests — replacing the interpreted
  * `filter(toks, t -> array_contains(...))` HOF chain that dominated
  * t02/t03 (per-token × per-word lambda dispatches).
  */
case class WordSetCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_word_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val strArr = (t: DataType) => t match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (!strArr(left.dataType) || !strArr(right.dataType))
      TypeCheckFailure("graft_word_count requires (array<string>, array<string>)")
    else if (!right.foldable)
      TypeCheckFailure("graft_word_count requires a literal word array")
    else TypeCheckSuccess
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def nullSafeEval(toks: Any, words: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    java.lang.Integer.valueOf(n)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WordSetCountExpr = copy(left = newLeft, right = newRight)
}

/** Word k-grams of a token array as one tight loop per row — the native
  * twin of `TextOps.wordShingles` (distinct=true, clampShort=true: docs
  * shorter than k yield ONE whole-text shingle, matching the
  * slice-clamping Column version) and `TextOps.wordNgramsAll`
  * (distinct=false, clampShort=false: empty below k, occurrence
  * counting). The interpreted `transform(sequence, i -> concat_ws(" ",
  * slice(toks, i, k)))` chain dispatches ~4 lambda closures per gram
  * and dominated c01/p01 wall-clock at sf0.1; here each gram is one
  * `UTF8String.concatWs` call (which, like `concat_ws`, skips null
  * tokens while the window still advances). Distinct keeps FIRST
  * occurrence order — `array_distinct` semantics.
  */
case class WordNgramsExpr(child: Expression, k: Int,
                          distinct: Boolean, clampShort: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val numGrams = if (n >= k) n - k + 1 else if (clampShort) 1 else 0
    if (numGrams == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (distinct) {
      val out = new java.util.LinkedHashSet[UTF8String]()
      var s = 0
      while (s < numGrams) {
        out.add(UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, s, math.min(s + k, n)): _*))
        s += 1
      }
      new GenericArrayData(out.toArray)
    } else {
      val out = new Array[Any](numGrams)
      var s = 0
      while (s < numGrams) {
        out(s) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, s, math.min(s + k, n)): _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

/** Exact integer dot product of two array<long> vectors, with full
  * whole-stage codegen (`doGenCode` splices a branch-free loop).
  */
/** One BPE merge round applied to a symbol sequence: greedy
  * left-to-right replacement of every non-overlapping adjacent
  * (lhs, rhs) occurrence with the concatenation lhs||rhs — Sennrich et
  * al. 2016's per-word merge step as one tight loop per row (the scan
  * reads ORIGINAL positions; a merge consumes i and i+1 and resumes at
  * i+2, so in a run of consecutive match positions exactly the
  * even-offset ones merge — the closed form the DuckDB oracle's
  * gaps-and-islands replay uses). Per-row and allocation-light: the
  * whole corpus rewrite per training round is map-side, zero shuffle.
  */
case class BpeMergeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  override def nullSafeEval(arrA: Any, lA: Any, rA: Any): Any = {
    val arr = arrA.asInstanceOf[ArrayData]
    val l = lA.asInstanceOf[UTF8String]
    val r = rA.asInstanceOf[UTF8String]
    val n = arr.numElements()
    val merged = UTF8String.concat(l, r)
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && l.equals(arr.getUTF8String(i)) &&
          r.equals(arr.getUTF8String(i + 1))) {
        out.add(merged); i += 2
      } else {
        out.add(arr.getUTF8String(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMergeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** A FULL trained BPE merge table applied to a symbol sequence in ONE
  * expression: (symbols array<string>, lhs array<string> literal,
  * rhs array<string> literal) → tokenized array<string>. Array index =
  * merge priority (training order).
  *
  * Why this exists: folding [[BpeMergeExpr]] once per merge builds a
  * plan whose depth is the vocabulary size — fine at 10 merges,
  * analyzer-fatal at a production 32k–50k-merge vocabulary. Here the
  * whole table is two broadcast-once array literals and the plan depth
  * is O(1) regardless of vocab size; tokenization stays a narrow
  * map-side projection.
  *
  * Semantics are EXACTLY the fold's (BpeSpec pins it): repeatedly find
  * the minimum-rank pair present in the sequence and run one greedy
  * left-to-right non-overlapping pass for it. Equivalence argument: a
  * single greedy pass visits every surviving position, so no (lhs,rhs)
  * adjacency survives it, and merging rank r can only create new
  * adjacencies involving its output symbol lhs||rhs — a symbol that
  * first exists after round r in training, so every table pair
  * containing it has rank > r. Lower ranks therefore never reappear,
  * and processing ranks in ascending-present order replays the
  * training-order fold verbatim. Per-row cost is O(L²) hash-map probes
  * for a word of L symbols — independent of table size.
  */
case class BpeApplyExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val strArr = (t: DataType) => t match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (!strArr(first.dataType) || !strArr(second.dataType) || !strArr(third.dataType))
      TypeCheckFailure("graft_bpe_apply requires (array<string>, array<string>, array<string>)")
    else if (!second.foldable || !third.foldable)
      TypeCheckFailure("graft_bpe_apply requires literal lhs/rhs merge arrays")
    else TypeCheckSuccess
  }

  /** rank lookup (lhs → rhs → rank) + per-rank (lhs, rhs, merged),
    * built once from the literal arrays. Nested maps avoid a tuple
    * allocation per probe in the scan loop.
    */
  @transient private lazy val (ranks, lhsByRank, rhsByRank, mergedByRank) = {
    val lhsA = second.eval(null).asInstanceOf[ArrayData]
    val rhsA = third.eval(null).asInstanceOf[ArrayData]
    require(lhsA.numElements() == rhsA.numElements(),
      s"graft_bpe_apply: lhs/rhs merge arrays differ in length " +
        s"(${lhsA.numElements()} vs ${rhsA.numElements()})")
    val n = lhsA.numElements()
    val rk = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]()
    val ls = new Array[UTF8String](n)
    val rs = new Array[UTF8String](n)
    val ms = new Array[UTF8String](n)
    var r = 0
    while (r < n) {
      val l = lhsA.getUTF8String(r).clone()
      val rt = rhsA.getUTF8String(r).clone()
      ls(r) = l; rs(r) = rt; ms(r) = UTF8String.concat(l, rt)
      var inner = rk.get(l)
      if (inner == null) { inner = new java.util.HashMap(); rk.put(l, inner) }
      if (!inner.containsKey(rt)) inner.put(rt, Integer.valueOf(r))
      r += 1
    }
    (rk, ls, rs, ms)
  }

  override def nullSafeEval(symsA: Any, lA: Any, rA: Any): Any = {
    val arr = symsA.asInstanceOf[ArrayData]
    var n = arr.numElements()
    val cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = arr.getUTF8String(i); i += 1 }
    var done = n <= 1
    while (!done) {
      // lowest rank among pairs present in the current sequence
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val inner = ranks.get(cur(i))
        if (inner != null) {
          val rk = inner.get(cur(i + 1))
          if (rk != null && rk.intValue() < best) best = rk.intValue()
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one greedy left-to-right non-overlapping pass — BpeMergeExpr's loop
        val l = lhsByRank(best); val rt = rhsByRank(best); val m = mergedByRank(best)
        var out = 0
        i = 0
        while (i < n) {
          if (i + 1 < n && l.equals(cur(i)) && rt.equals(cur(i + 1))) {
            cur(out) = m; i += 2
          } else {
            cur(out) = cur(i); i += 1
          }
          out += 1
        }
        n = out
        done = n <= 1
      }
    }
    val res = new Array[Any](n)
    i = 0
    while (i < n) { res(i) = cur(i); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeApplyExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** The repo's canonical string hash (FNV-1a over UTF-8 bytes +
  * splitmix64 finalizer) as a standalone scalar — the per-occurrence
  * key for sketch position derivation (Count-Min). Same math the
  * DuckDB oracle ports (`DuckSketchSql` fnvRaw + mix64 CTEs).
  */
case class Hash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeExprs.hashUtf8(input.asInstanceOf[UTF8String]))
  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
}

/** 2-D Hilbert curve index of two 16-bit coordinates (order-16 xy2d,
  * the classic rotate-and-accumulate loop; Hamilton's convention as in
  * the Wikipedia reference implementation). Why a NATIVE expression and
  * not Column arithmetic: the per-level rotation rebinds BOTH
  * coordinates from both previous coordinates, so an unrolled Column
  * fold duplicates the operand trees ~3× per level — 3^16 nodes by
  * level 16 — where this loop is 16 iterations of flat long math
  * (spliced into whole-stage codegen below). The DuckDB oracle carries
  * (x, y, d) through 16 chained CTEs instead — linear there, because
  * each stage references the previous CTE's COLUMNS, not its
  * expressions.
  */
case class HilbertD2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_d2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 0xFFFFL
    var y = b.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate quadrant
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    java.lang.Long.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & 0xFFFFL; long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 1L << 15; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertD2Expr = copy(left = newLeft, right = newRight)
}

case class DotFixedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_fixed"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotFixedExpr = copy(left = newLeft, right = newRight)
}
