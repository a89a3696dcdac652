package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft's column-function library (codegen-friendly compositions of
  * Spark built-ins — no UDFs in the hot path).
  */
object gf {

  /** Round half-away-from-zero on the scaled IEEE double — i.e.
    * `sign(x) * floor(|x| * 10^n + 0.5) / 10^n` evaluated in double
    * arithmetic throughout.
    *
    * Spark's `round()` rounds the *shortest decimal rendering* of the
    * double (it goes through `BigDecimal.valueOf`), which disagrees with
    * engines that round the raw binary value (DuckDB, C++ `std::round`)
    * whenever the scaled value sits on a representation boundary
    * (e.g. 44418.4005 → Spark .401, DuckDB .400). All graft query outputs
    * round with this function so results are bit-identical to a
    * double-arithmetic oracle. Valid for |x|·10^n < 2^52.
    */
  def dround(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    (signum(c) * floor(abs(c) * s + 0.5d) / s).cast("double")
  }

  /** Quantize a fixed-decimal value carried in a double to integer units
    * (`scale`=100 → cents). For values that ARE k-decimal (as all testdata
    * money/measure columns are), the recovery is exact: `x*scale` lands
    * within an ulp of an integer, so `floor(+0.5)` snaps to it.
    *
    * Why: summing doubles is order-dependent, so a distributed aggregate
    * over doubles is not reproducible across partitionings (or engines).
    * Summing quantized longs is exact and order-independent — the same
    * aggregate gives bit-identical results at any parallelism, which is
    * what makes results hash-comparable against a single-node oracle and
    * stable run-to-run under AQE at cluster scale. (At extreme scale
    * sum-of-longs can overflow; swap the sum to decimal(38,0) there.)
    */
  def fixed(c: Column, scale: Double): Column =
    floor(c * scale + 0.5d).cast("long")

  /** Mean from a fixed-point sum: deterministic double division, written
    * with the exact same association `(sum / n) / scale` as the oracle SQL.
    */
  def meanFromFixed(sumFixed: Column, n: Column, scale: Double): Column =
    sumFixed.cast("double") / n / scale

  /** Exact sum from a fixed-point sum: one deterministic division. */
  def sumFromFixed(sumFixed: Column, scale: Double): Column =
    sumFixed.cast("double") / scale

  /** Sample stddev from exact fixed-point sums: classic one-pass formula
    * `sqrt((Σx² − (Σx)²/n)/(n−1))/scale`, NULL for n<2 (matching both
    * Spark's and DuckDB's `stddev` on a single sample). `greatest(0, ·)`
    * clamps negative cancellation residue so neither engine yields NaN.
    */
  def stddevFromFixed(sumF: Column, sumSqF: Column, n: Column, scale: Double): Column = {
    val varF = greatest(lit(0.0d),
      (sumSqF.cast("double") - sumF.cast("double") * sumF.cast("double") / n) / (n - 1))
    when(n > 1, sqrt(varF) / scale).otherwise(lit(null).cast("double"))
  }
}
