package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Exact frequent-items (φ-heavy-hitters) at corpus scale.
  *
  * The naive "count every distinct item, filter" shuffles the FULL
  * (item, count) table — at 100 TB the token vocabulary is billions of
  * rows of shuffle for a result of a few hundred. This operator follows
  * the repo's sketch discipline — sketches GENERATE candidates, exact
  * kernels DECIDE:
  *
  *   1. each partition runs a Misra-Gries(k) summary (Misra & Gries
  *      1982, "Finding repeated elements") over its rows via
  *      `mapPartitions` — the sanctioned use: genuinely imperative
  *      per-partition state, O(k) memory, zero shuffle;
  *   2. the union of local candidates is provably a SUPERSET of every
  *      global item with freq > n/k: if freq(x) > n/k globally, then
  *      freq_p(x) > n_p/k in at least one partition (else summing the
  *      per-partition bounds contradicts the global), and MG(k) never
  *      evicts a local majority-fraction item;
  *   3. exact recount of candidates only (broadcast semi-join + one
  *      small aggregation) and the EXACT integer threshold
  *      `cnt·k > n_total` decide membership.
  *
  * The output is therefore exact and partition-invariant even though
  * the intermediate candidate set is not: re-partitioning changes which
  * false candidates get counted and discarded, never the survivors.
  * (Pinned by FrequencySpec: planted skew at two parallelism levels.)
  */
object Frequency {

  /** All items occurring more than once per `k` rows (freq > n/k),
    * with exact counts. `items` needs a string column `itemCol`.
    * Output: (item, cnt, n_total), ordered by cnt desc, item.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val it = items.select(col(itemCol).cast("string").as("item"))
    val cands = it.as[String].mapPartitions { rows =>
      val counts = mutable.HashMap.empty[String, Long]
      rows.foreach { s =>
        if (counts.contains(s)) counts(s) += 1L
        else if (counts.size < k) counts(s) = 1L
        else {
          // classic MG step: new item unrepresented and table full →
          // decrement every counter, evict zeros, drop the new item
          val dead = List.newBuilder[String]
          counts.foreach { case (key, v) =>
            if (v == 1L) dead += key else counts(key) = v - 1L
          }
          dead.result().foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("item").distinct()
    val total = it.groupBy().agg(count(lit(1)).as("n_total"))
    it.join(broadcast(cands), Seq("item"))
      .groupBy($"item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter($"cnt" * k > $"n_total") // exact integer form of freq > n/k
      .select($"item", $"cnt", $"n_total")
      .orderBy($"cnt".desc, $"item")
  }
}
