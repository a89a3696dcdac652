package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter semi-join pruning — the distributed runtime-
  * filter pattern as a first-class, oracle-able operator.
  *
  * At 100 TB the expensive part of `fact ⋈ dim` is shuffling the fact
  * side; when the dim side is selective, a Bloom filter of its keys
  * broadcast to the fact scan drops most fact rows BEFORE the shuffle.
  * (Spark's AQE injects such filters itself when statistics warrant —
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` — but its filter
  * uses non-portable internal hashing; this operator is the same idea
  * with the repo's deterministic splitmix64, so the pruned row set and
  * false-positive count are exact, reproducible, and DuckDB-checkable.)
  *
  * Layout: m = 2^16 bits in 2048 32-bit words (32-bit words keep every
  * value positive — BIGINT shift semantics then agree across engines
  * with no sign-bit edge). k = 3 probe positions = three 16-bit slices
  * of one splitmix64 mix (independent enough at these fill rates, and
  * one hash per row instead of three). For n dim keys the false-positive
  * rate is (1 − e^(−3n/65536))³ — ~2·10⁻⁵ at n ≈ 600.
  *
  * Correctness is NEVER at stake: the Bloom pass only GENERATES the
  * candidate subset; the exact semi-join against the dim keys DECIDES
  * (false positives cost compute, never answers) — the same
  * generate/decide split as the repo's LSH dedup.
  */
object BloomPrune {

  val Bits = 16 // m = 2^16 bloom bits
  val K = 3     // probe positions per key

  /** The k probe bit-positions of a long key: 16-bit slices of one
    * splitmix64 mix.
    */
  def positions(key: Column): Seq[Column] =
    (0 until K).map { i =>
      shiftrightunsigned(Hll.mix64Col(key), i * 16).bitwiseAND(lit(0xFFFFL))
    }

  /** Build the filter from a (small) dim-key frame: one explode + one
    * 2048-group bit_or aggregate → (word, bits) rows, broadcast-sized
    * by construction.
    */
  def build(dim: DataFrame, keyCol: String): DataFrame =
    dim.select(explode(array(positions(col(keyCol)): _*)).as("pos"))
      .select(
        shiftrightunsigned(col("pos"), 5).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .groupBy(col("word"))
      .agg(bit_or(col("bit")).as("bits"))

  /** Keep only fact rows whose key passes every probe: 3 broadcast
    * joins against the word table + bit tests. Missing word ⇒ bit
    * clear ⇒ row dropped (coalesce to 0).
    */
  def prune(fact: DataFrame, keyCol: String, bloom: DataFrame): DataFrame = {
    val ps = positions(col(keyCol))
    ps.zipWithIndex.foldLeft(fact) { case (df, (p, i)) =>
      val b = bloom.select(col("word").as(s"_w$i"), col("bits").as(s"_b$i"))
      df.withColumn(s"_pos$i", p)
        .join(broadcast(b), shiftrightunsigned(col(s"_pos$i"), 5) === col(s"_w$i"), "left")
        .filter(
          expr(s"shiftright(coalesce(_b$i, CAST(0 AS BIGINT)), CAST(_pos$i % 32 AS INT))")
            .bitwiseAND(lit(1L)) === lit(1L))
        .drop(s"_pos$i", s"_w$i", s"_b$i")
    }
  }
}
