package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 intervalization (slowly-changing-dimension type 2): collapse a
  * keyed, totally-ordered event stream's state column into versioned
  * validity intervals — the standard dimension-history build of a
  * warehouse load, and the batch face of "state changes over time".
  *
  * Shape at scale: both windows partition by the entity key (never
  * global), so this is ONE sort-shuffle on key reused by the lag, the
  * running version sum, and the interval lead — plus one hash
  * aggregate. The tiebreak column makes the ordering total (the repo
  * rule: no order-dependent result may hinge on a non-deterministic
  * sort).
  */
object Scd {

  /** → (key, version, state, valid_from, valid_to, n_events); valid_to
    * is null for each key's current (open) version. `state` must be
    * non-null; within a version it is constant by construction.
    */
  def intervals(df: DataFrame, key: String, ts: String, tiebreak: String,
                state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val prev = lag(col(state), 1).over(w)
    val flagged = df
      .withColumn("_chg", when(prev.isNull || prev =!= col(state), 1L).otherwise(0L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val vers = flagged.groupBy(col(key), col("version"))
      .agg(min(col(state)).as("state"), // constant within a version
        min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col(key)).orderBy(col("version"))
    vers.withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col(key), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }
}
