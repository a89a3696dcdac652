package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, language-ID scoring, fingerprinting.
  *
  * Everything is built from codegen'd built-ins (regexp/string/array
  * higher-order functions) — zero UDFs, so the whole document pipeline
  * stays inside WholeStageCodegen and scales linearly with no
  * serialization boundary. All counts are integers and all ratios are
  * divisions of exact integers, so results are bit-stable across
  * engines and partitionings.
  */
object TextOps {

  /** Canonical text normalization: lowercase + whitespace collapse.
    * The anchor for fingerprinting and dedup — normalize once, derive
    * everything from the normalized form.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace token count (`\S+` runs). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish subword count: letter runs, single digits, single
    * punctuation — the standard pre-tokenizer shape, as a cheap
    * token-budget estimator for LLM data work.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Tokens of the normalized text as an array column. */
  def tokens(norm: Column): Column = split(norm, " ")

  /** Count of tokens that appear in `words` (exact membership on the
    * normalized token array — immune to regex word-boundary dialects).
    * Runs as the native `graft_word_count` expression — one hash-set
    * loop per row instead of interpreted per-token × per-word lambdas
    * (requires graft functions registered: GraftExtensions or
    * `NativeExprs.ensureRegistered`).
    */
  def wordSetCount(toks: Column, words: Seq[String]): Column =
    call_function("graft_word_count", toks, array(words.map(lit): _*))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  val EnStop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are")

  /** Quality features + composite score (0..100, higher = better):
    * rewards moderate length, words of plausible length, some stopword
    * mass, low punctuation density. The exact weights are this engine's
    * spec — what matters operationally is that every feature is an
    * integer ratio, so filtering at a threshold is reproducible.
    */
  def qualityScore(nChars: Column, nTokens: Column, nStop: Column, nPunct: Column): Column = {
    val meanWordLen = nChars.cast("double") / nTokens
    val stopRatio = nStop.cast("double") / nTokens
    val punctRatio = nPunct.cast("double") / nChars
    val lenScore = when(nChars >= 200 && nChars <= 2000, 40.0)
      .when(nChars >= 50, 20.0).otherwise(0.0)
    val wordScore = when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 30.0).otherwise(10.0)
    val stopScore = when(stopRatio >= 0.05, 20.0).otherwise(5.0)
    val punctScore = when(punctRatio <= 0.1, 10.0).otherwise(0.0)
    lenScore + wordScore + stopScore + punctScore
  }

  /** Language marker-word profiles (tiny stopword sets per language). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"))

  /** Argmax language prediction from marker counts, 'und' (undetermined)
    * when no marker hits; ties resolve in [[LangMarkers]] order (the
    * dominant-pollutant tie rule, ASVSP `consumer2.py:87-96`).
    */
  def predictLang(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lang).otherwise(acc)
    }
    // foldRight puts the FIRST language's when outermost → first wins ties
    chain
  }

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(norm: Column): Column = md5(norm)

  /** PII scrubbing patterns (dialect-portable subset: no \b, no
    * lookaround — identical semantics in Java regex and DuckDB's RE2).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{6,}"

  /** Redact emails then long digit runs — the standard pre-training
    * scrub pass, as codegen'd regexp_replace chain (order matters:
    * digits inside an email are consumed by the email redaction first).
    */
  def redactPII(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")

  /** Character k-shingles of the normalized text (distinct). Documents
    * shorter than k yield the whole text as one shingle.
    */
  def shingles(norm: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))

  /** Chunk-start indexes for sliding token-window chunking: 0, stride,
    * 2·stride, … while the start lies inside the array — so every token
    * lands in ≥1 chunk and consecutive chunks overlap by (size − stride)
    * tokens. A doc shorter than one chunk yields exactly one chunk.
    * Explode this, then [[chunkSlice]] each index.
    */
  def chunkIdx(toks: Column, stride: Int): Column =
    sequence(lit(0L),
      call_function("div", (size(toks) - 1).cast("long"), lit(stride.toLong)))

  /** The `size`-token chunk starting at chunk index `idx` (clamped at
    * the tail — the final chunk may be shorter).
    */
  def chunkSlice(toks: Column, idx: Column, size: Int, stride: Int): Column =
    slice(toks, (idx * stride + 1).cast("int"), lit(size))

  /** Word k-shingles over a token array (distinct, space-joined,
    * first-occurrence order; docs shorter than k yield one whole-text
    * shingle). Runs as the native `graft_word_shingles` expression —
    * the interpreted transform/slice/concat_ws chain it replaces cost
    * ~4 lambda dispatches per gram and dominated c01/p01 (requires
    * graft functions registered: GraftExtensions or
    * `NativeExprs.ensureRegistered`).
    */
  def wordShingles(toks: Column, k: Int): Column =
    call_function("graft_word_shingles", toks, lit(k))

  /** ALL word k-shingles (non-distinct, for occurrence counting), empty
    * for docs shorter than k tokens — unlike [[wordShingles]]' clamp-to-
    * one semantics. Native `graft_word_ngrams_all` expression (requires
    * graft functions registered).
    */
  def wordNgramsAll(toks: Column, k: Int): Column =
    call_function("graft_word_ngrams_all", toks, lit(k))

  /** Within-document n-gram repetition rate: (occurrences − distinct) /
    * occurrences over [[wordNgramsAll]] output — the Gopher-style
    * duplicate-n-gram filter signal, computed per ROW (no shuffle).
    * NULL when the doc has no n-grams.
    */
  def dupNgramFrac(grams: Column): Column =
    when(size(grams) > 0,
      (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
      .otherwise(lit(null).cast("double"))

  /** Min-hash-of-one-permutation as a cheap locality fingerprint: the
    * lexicographic min of md5 over all k-shingles. Identical texts agree;
    * near-identical texts agree with probability ≈ Jaccard.
    */
  def minShingleMd5(norm: Column, k: Int): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => md5(norm.substr(i, lit(k)))))
}
