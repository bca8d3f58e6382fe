package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal) join — the operator SURVEY.md §2.B lists as "window-
  * function emulation over union": for each left event, the latest right
  * event with the same key at-or-before its timestamp.
  *
  * Implementation is the UNION-SORT pattern, not a join: tag both sides,
  * sort by (key, ts, side), and carry the right side's attributes forward
  * with `last(..., ignoreNulls)` over an unbounded-preceding frame. One
  * shuffle on the key, no per-key cross product — at 100 TB this is a single
  * sort-merge pass, where a range-join formulation would blow up on hot
  * keys. DuckDB expresses the same operator natively (`ASOF JOIN`), which
  * provides the oracle.
  */
object AsOf {

  /** q47 — for each purchase, the user's most recent click at-or-before it.
    * Output: (event_id, user_id, click_id, gap_us) — gap in microseconds,
    * null when the user never clicked before the purchase.
    *
    * Tie-break assumption: among multiple clicks by one user at an identical
    * ts, this picks the max event_id (last in (ts, is_left, event_id) order),
    * while DuckDB's ASOF JOIN leaves that choice unspecified. The fixture
    * events carry nanosecond timestamps with no duplicate (user_id, ts)
    * click pairs (verified round 1), so the oracle compare is stable; if a
    * fixture ever gains such duplicates, pre-dedup clicks to max event_id per
    * (user_id, ts) on both sides.
    */
  def purchaseLastClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("is_left"), lit(null).cast("long").as("r_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("is_left"), col("event_id").as("r_id"))
    // At equal ts the right side sorts first (is_left asc) ⇒ "at or before".
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("click_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts_us",
        last(when(col("is_left") === 0, unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(
        col("event_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - col("click_ts_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val purchaseLastClickOracle: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_asof_purchase_click" -> (purchaseLastClick _))

  val oracles: Map[String, String] = Map(
    "q47_asof_purchase_click" -> purchaseLastClickOracle)
}
