package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-checked queries.
  *
  * Double summation is order-dependent, and Spark's partial/final aggregation
  * order differs from DuckDB's sequential scan, so `sum(double)` is not
  * bitwise reproducible. House rule: scale money-like doubles to integers
  * per-row (deterministic — both engines see identical input doubles and
  * positive-half-up rounding agrees between Spark's HALF_UP and DuckDB's
  * round-half-away for positive values), sum exactly as BIGINT, and divide
  * back at the end. Integer sums are associative ⇒ bitwise identical under
  * any partitioning, on 32 threads or 1000 executors.
  */
object Det {

  /** Per-row scaled-integer conversion: round(c · 10^scale) as long. */
  def scaled(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong, 0).cast("long")

  /** Exact, order-independent sum of a money-like double, back in units. */
  def exactSum(c: Column, scale: Int): Column =
    (sum(scaled(c, scale)) / math.pow(10, scale))

  /** Exact mean: integer sum divided by count (both deterministic). */
  def exactAvg(c: Column, scale: Int): Column =
    sum(scaled(c, scale)) / math.pow(10, scale) / count(lit(1))

  /** DuckDB-side equivalents (DuckDB sums BIGINT into HUGEINT — cast back). */
  def sqlScaled(expr: String, scale: Int): String =
    s"CAST(round(($expr) * ${math.pow(10, scale).toLong}) AS BIGINT)"

  def sqlExactSum(expr: String, scale: Int): String =
    s"(CAST(sum(${sqlScaled(expr, scale)}) AS BIGINT) / ${math.pow(10, scale).toLong}.0)"

  /** Spark-SQL flavor: Spark parses `100.0` literals as DECIMAL (DuckDB as
    * DOUBLE), so the divisor needs an explicit double cast to keep the
    * output double on both sides.
    */
  def sqlExactSumSpark(expr: String, scale: Int): String =
    s"(CAST(sum(${sqlScaled(expr, scale)}) AS BIGINT) / CAST(${math.pow(10, scale).toLong} AS DOUBLE))"

  def sqlExactAvg(expr: String, scale: Int): String =
    s"(CAST(sum(${sqlScaled(expr, scale)}) AS BIGINT) / ${math.pow(10, scale).toLong}.0 / count(*))"
}
