package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance-1) self-join over a vocabulary — typo-pair
  * discovery for text-pipeline normalization — via DELETION-NEIGHBORHOOD
  * blocking (the FastSS scheme, Bocek et al. 2007): two strings are
  * within Levenshtein distance 1 only if they share a key in
  * {s} ∪ {s with one char deleted}, so candidate generation is an
  * equi-join on ≤ len+1 keys per word instead of all-pairs — the same
  * generate/decide split as every sketch in the repo, with the exact
  * `levenshtein` kernel deciding.
  *
  * Scale shape: the vocabulary is already an aggregate (|vocab| ≪
  * corpus); keys explode it ×(len+1), the join shuffles only key
  * collisions, and nothing is quadratic. The deletion-key lambda is an
  * interpreted HOF — fine here because it runs once per vocabulary
  * WORD, not per corpus occurrence (the NativeExprs rule's boundary).
  */
object FuzzyJoin {

  /** {s} ∪ single-char-deletion variants, deduplicated. Callers must
    * ensure length ≥ 1 (the repo's descending-`sequence` trap).
    */
  def deletionKeys(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** All unordered pairs of `vocab` (columns token, cnt) at Levenshtein
    * distance EXACTLY 1, with both counts. Blocking generates, exact
    * edit distance decides.
    */
  def lev1Pairs(vocab: DataFrame): DataFrame = {
    val keyed = vocab
      .select(col("token"), col("cnt"), explode(deletionKeys(col("token"))).as("k"))
      .persist() // both self-join sides (aliasing defeats exchange reuse)
    val pairs = keyed.select(col("k"), col("token").as("token_a"), col("cnt").as("cnt_a"))
      .join(keyed.select(col("k"), col("token").as("token_b"), col("cnt").as("cnt_b")),
        Seq("k"))
      .filter(col("token_a") < col("token_b"))
      .select(col("token_a"), col("token_b"), col("cnt_a"), col("cnt_b"))
      .distinct()
      .filter(levenshtein(col("token_a"), col("token_b")) === 1)
      .localCheckpoint() // release the keyed cache eagerly
    keyed.unpersist()
    pairs
  }
}
