package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` columns, expressed with Spark's built-in
  * higher-order functions (`zip_with` / `aggregate` / `transform`) rather than
  * Scala UDFs. Higher-order functions operate on Catalyst `ArrayData`
  * directly — no per-row boxing of a `Seq[Float]` — and stay inside the
  * optimized plan, so column pruning and filter pushdown around them keep
  * working. All arithmetic is widened to double so results are bitwise
  * comparable with a DuckDB oracle computing on `DOUBLE[]`.
  *
  * Reference semantics: exact Euclidean re-rank distance of the two-phase ANN
  * search (SURVEY.md §2.A A6) and cosine similarity used by near-duplicate
  * detection. The reference computes these in plugin Java on a single
  * coordinating node; here they are ordinary Catalyst expressions evaluated
  * data-parallel on executors.
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0d), (acc, x) => acc + x)

  /** Σ (aᵢ−bᵢ)² — squared L2; cheaper when only rank order matters. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0d), (acc, x) => acc + x)

  /** Euclidean distance ‖a−b‖₂. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => d(x) * d(x)), lit(0.0d), (acc, x) => acc + x))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
