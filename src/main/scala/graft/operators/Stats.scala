package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical aggregate + rank-distribution operators over `events` —
  * the OLAP families (quantiles, distribution windows, moments) beyond the
  * plain sum/avg/count coverage in [[Relational]].
  *
  * Determinism notes: percentiles interpolate two parquet doubles both
  * engines read bit-identically; every display value goes through the
  * boundary-exact [[Det.display]] half-up floor (r11 discipline — see the
  * Det scaladoc), never an engine's own `round(double, n)`; variance avoids
  * `var_pop`'s engine-specific accumulation entirely by computing
  * E[x²]−E[x]² from exact scaled-long sums, with the identical double
  * expression written on both sides.
  */
object Stats {

  /** q54 — exact interpolated percentiles (p25/p50/p75) of value per event
    * type. Spark `percentile` and DuckDB `quantile_cont` both use the
    * sorted-interpolation definition. At 100 TB swap for
    * `approx_percentile` (t-digest) — exact percentile requires a per-group
    * sort; gated exactly here because the gate SF makes exact affordable.
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.display(expr("percentile(value, 0.25)"), 4).as("p25"),
        Det.display(expr("percentile(value, 0.5)"), 4).as("p50"),
        Det.display(expr("percentile(value, 0.75)"), 4).as("p75"))
      .orderBy(col("event_type"))
  }

  val percentilesOracle: String =
    """SELECT event_type, count(*) AS n,
      |       floor(quantile_cont(value, 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
      |       floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
      |       floor(quantile_cont(value, 0.75) * 10000.0 + 0.5) / 10000.0 AS p75
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q185 — PERCENTILE RANKS (ES `percentile_ranks`): q54's inverse — for
    * fixed value thresholds, what fraction of each group's values sits at
    * or below them (the SLA question: "what share of latencies is under
    * 100?"). Pure counting, so unlike interpolated percentiles the result
    * is EXACT integer arithmetic end to end: per-threshold conditional
    * counts and one integer-ppm division, bitwise identical on any engine
    * or partitioning — one aggregate pass, map-side partials.
    */
  /** q190 — TWO-SAMPLE T-TEST (ES `t_test` agg, unpaired heteroscedastic =
    * Welch): is the value difference between two event segments
    * significant — the A/B readout (did the new quality filter move
    * downstream metrics?) as one aggregate. Completes the statistical-agg
    * family: q54 percentiles, q185 ranks, q56 stats, q184 correlation,
    * q190 t-test.
    *
    * Determinism discipline (the q184 argument): values scale to integer
    * cents per row, the SIX conditional moment sums are exact BIGINT
    * (order-independent under any partitioning), the variance NUMERATORS
    * `n·Σx² − (Σx)²` are formed in BIGINT (exact — never a catastrophic
    * double subtraction), and the t statistic is one fixed tree of
    * correctly-rounded double ops (÷, +, sqrt) over those exact inputs —
    * bitwise identical on both engines. The cents scaling cancels in t
    * (numerator and denominator both scale by 100). Degenerate segments
    * (n < 2 or zero variance in both) yield NULL, surfaced not thrown.
    * Overflow: the widest product is the guard/variance term n·Σx²; with
    * ĉ = max |scaled cents| its worst case is n²·ĉ², inside BIGINT while
    * n·ĉ ≲ 3·10⁹ — e.g. ±100-unit values to ~3·10⁵ rows per segment at
    * the adversarial extreme, far beyond that on real distributions
    * (RMS ≪ max). Past the frontier, swap the moments to DECIMAL(38,0)
    * (the q116 valve); EITHER WAY the failure mode is LOUD — the
    * session's ANSI arithmetic throws on the first overflowing product
    * (spec-pinned in MiscSpec), never a silent wraparound.
    *
    * Scale shape: ONE filtered corpus aggregate with map-side partials;
    * everything after runs on a single row.
    */
  def tTest(
      spark: SparkSession,
      sfDir: String,
      typeA: String = "view",
      typeB: String = "purchase"): DataFrame =
    tTestOf(Tables.events(spark, sfDir), typeA, typeB)

  /** The aggregate over ANY (event_type, value) frame — the gate wrapper
    * binds the fixture table; specs drive it with an absent segment (NULL
    * mean, not 0/0) and with values past the documented BIGINT bound (the
    * ANSI overflow valve fires loud — see the overflow note above).
    */
  def tTestOf(
      events: DataFrame,
      typeA: String,
      typeB: String): DataFrame = {
    def side(t: String, tag: String) = Seq(
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col("event_type") === t, Det.scaled(col("value"), 2))
        .otherwise(0L)).as(s"s_$tag"),
      sum(when(col("event_type") === t,
        Det.scaled(col("value"), 2) * Det.scaled(col("value"), 2))
        .otherwise(0L)).as(s"ss_$tag"))
    val moments = side(typeA, "a") ++ side(typeB, "b")
    events
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy()
      .agg(moments.head, moments.tail: _*)
      .select(
        lit(typeA).as("type_a"), lit(typeB).as("type_b"),
        // coalesce for the zero-row edge only: with NEITHER segment present
        // the filter keeps no rows and the global sums are NULL — report
        // n = 0, not NULL (any surviving row makes the sums non-null, so
        // this cannot perturb the gate).
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        // n >= 1 guard, the t-statistic's discipline: an EMPTY segment gets
        // an explicit NULL mean on both engines, never an engine-specific
        // 0/0 (Spark NULL vs a potential NaN elsewhere) riding into the
        // hash gate on a degenerate fixture.
        when(col("n_a") >= 1,
          Det.display(col("s_a") / col("n_a") / 100.0, 4)).as("mean_a"),
        when(col("n_b") >= 1,
          Det.display(col("s_b") / col("n_b") / 100.0, 4)).as("mean_b"),
        when(col("n_a") >= 2 && col("n_b") >= 2 &&
          (col("n_a") * col("ss_a") - col("s_a") * col("s_a") > 0 ||
            col("n_b") * col("ss_b") - col("s_b") * col("s_b") > 0),
          Det.display(
            (col("s_a") / col("n_a") - col("s_b") / col("n_b")) /
              sqrt(
                (col("n_a") * col("ss_a") - col("s_a") * col("s_a")) /
                  (col("n_a") * (col("n_a") - lit(1.0))) / col("n_a") +
                (col("n_b") * col("ss_b") - col("s_b") * col("s_b")) /
                  (col("n_b") * (col("n_b") - lit(1.0))) / col("n_b")), 4))
          .as("t_stat"))
  }

  def tTestOracle(
      typeA: String = "view", typeB: String = "purchase"): String = {
    val a = typeA.replace("'", "''")
    val b = typeB.replace("'", "''")
    def side(t: String, tag: String) =
      s"""CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$tag,
         |  CAST(sum(CASE WHEN event_type = '$t' THEN ${Det.sqlScaled("value", 2)}
         |           ELSE 0 END) AS BIGINT) AS s_$tag,
         |  CAST(sum(CASE WHEN event_type = '$t' THEN ${Det.sqlScaled("value", 2)}
         |           * ${Det.sqlScaled("value", 2)} ELSE 0 END) AS BIGINT) AS ss_$tag"""
        .stripMargin
    s"""WITH m AS (
       |  SELECT ${side(a, "a")},
       |  ${side(b, "b")}
       |  FROM events WHERE event_type IN ('$a', '$b'))
       |SELECT '$a' AS type_a, '$b' AS type_b,
       |       CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
       |       CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
       |       CASE WHEN n_a >= 1
       |            THEN floor(s_a / n_a / 100.0 * 10000.0 + 0.5) / 10000.0 END AS mean_a,
       |       CASE WHEN n_b >= 1
       |            THEN floor(s_b / n_b / 100.0 * 10000.0 + 0.5) / 10000.0 END AS mean_b,
       |       CASE WHEN n_a >= 2 AND n_b >= 2 AND
       |                 (n_a * ss_a - s_a * s_a > 0 OR n_b * ss_b - s_b * s_b > 0)
       |            THEN floor((s_a / n_a - s_b / n_b) /
       |                       sqrt((n_a * ss_a - s_a * s_a)
       |                              / (n_a * (n_a - 1.0)) / n_a +
       |                            (n_b * ss_b - s_b * s_b)
       |                              / (n_b * (n_b - 1.0)) / n_b)
       |                       * 10000.0 + 0.5) / 10000.0
       |            END AS t_stat
       |FROM m""".stripMargin
  }

  /** Shared by [[percentileRanks]] AND [[percentileRanksOracle]] so the
    * lockstep pair rejects the same inputs: duplicate thresholds would
    * collide output column names, and a negative would put '-' inside a
    * generated name (the backticked-identifier / SQL-parse trap) — a guard
    * on only one side would let the other build a doomed query.
    */
  private def requireValidThresholds(thresholds: Seq[Long]): Unit =
    require(thresholds.nonEmpty && thresholds.distinct.size == thresholds.size
      && thresholds.forall(_ >= 0), s"thresholds must be distinct and >= 0: $thresholds")

  def percentileRanks(
      spark: SparkSession,
      sfDir: String,
      thresholds: Seq[Long] = Seq(50L, 100L, 200L)): DataFrame = {
    requireValidThresholds(thresholds)
    val aggs = thresholds.map(t =>
      sum(when(col("value") <= t.toDouble, 1L).otherwise(0L)).as(s"c$t"))
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), aggs: _*)
      .select(
        col("event_type") +: col("n") +:
          thresholds.map(t =>
            expr(s"`c$t` * 1000000L div n").as(s"rank_${t}_ppm")): _*)
      .orderBy(col("event_type"))
  }

  def percentileRanksOracle(thresholds: Seq[Long] = Seq(50L, 100L, 200L)): String = {
    requireValidThresholds(thresholds)
    val cols = thresholds.map(t =>
      s"""(CAST(sum(CASE WHEN value <= $t THEN 1 ELSE 0 END) AS BIGINT)
         |         * 1000000) // count(*) AS rank_${t}_ppm""".stripMargin)
      .mkString(",\n       ")
    s"""SELECT event_type, count(*) AS n,
       |       $cols
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** q55 — rank-distribution windows: quartile bucket (ntile) and
    * percent_rank of each event within its type. The window order is a
    * TOTAL order (value, event_id) so tile/rank assignment is deterministic
    * on both engines; percent_rank over a total order is (rank−1)/(n−1),
    * identical arithmetic.
    */
  def rankDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .filter(col("user_id") < 20)
      .select(
        col("event_id"),
        col("event_type"),
        ntile(4).over(w).as("tile"),
        Det.display(percent_rank().over(w), 6).as("pr6"))
      .orderBy(col("event_id"))
  }

  val rankDistributionOracle: String =
    """SELECT event_id, event_type,
      |       CAST(ntile(4) OVER w AS INTEGER) AS tile,
      |       floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pr6
      |FROM events
      |WHERE user_id < 20
      |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** q56 — moment statistics with deterministic arithmetic: mean and
    * population variance from exact scaled-long sums (s1 = Σ⌊100v⌉,
    * s2 = Σ⌊100v⌉²), dividing back in the SAME double-expression order on
    * both engines. `var_pop`/`stddev` built-ins are avoided on purpose —
    * their single-pass accumulation (Welford vs naive) differs between
    * engines and across partitionings.
    */
  def valueStats(spark: SparkSession, sfDir: String): DataFrame = {
    val sv = Det.scaled(col("value"), 2)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(sv).as("s1"),
        sum(sv * sv).as("s2"))
      .select(
        col("event_type"), col("n"),
        Det.display(col("s1") / 100.0 / col("n"), 4).as("mean4"),
        Det.display(
          col("s2") / 10000.0 / col("n")
            - (col("s1") / 100.0 / col("n")) * (col("s1") / 100.0 / col("n")),
          4).as("var4"))
      .orderBy(col("event_type"))
  }

  val valueStatsOracle: String = {
    val s1 = s"CAST(sum(${Det.sqlScaled("value", 2)}) AS BIGINT)"
    val s2 = s"CAST(sum(${Det.sqlScaled("value", 2)} * ${Det.sqlScaled("value", 2)}) AS BIGINT)"
    s"""SELECT event_type, count(*) AS n,
       |       floor($s1 / 100.0 / count(*) * 10000.0 + 0.5) / 10000.0 AS mean4,
       |       floor(($s2 / 10000.0 / count(*)
       |              - ($s1 / 100.0 / count(*)) * ($s1 / 100.0 / count(*)))
       |             * 10000.0 + 0.5) / 10000.0 AS var4
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** q57 — pivot (long → wide): per-user event counts fanned into one
    * column per event type. The pivot values are EXPLICIT (the five fixture
    * event types) — at scale an implicit pivot adds a distinct-values job
    * before planning; naming them keeps it one pass. The oracle writes the
    * same thing portably with FILTERed aggregates.
    */
  def pivotEvents(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .filter(col("user_id") < 30)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy(col("user_id"))
  }

  val pivotEventsOracle: String =
    """SELECT user_id,
      |       count(*) FILTER (event_type = 'click') AS click,
      |       count(*) FILTER (event_type = 'error') AS error,
      |       count(*) FILTER (event_type = 'purchase') AS purchase,
      |       count(*) FILTER (event_type = 'signup') AS signup,
      |       count(*) FILTER (event_type = 'view') AS view
      |FROM events
      |WHERE user_id < 30
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q58 — unpivot/melt (wide → long): lineitem's three money-like columns
    * as (measure, amount) rows — the inverse reshaping primitive. Spark's
    * native `unpivot` (codegen Expand); the oracle is the portable
    * UNION ALL formulation.
    */
  def unpivotLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "amount")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("measure"),
        Det.display(col("amount"), 4).as("amount4"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
  }

  val unpivotLineitemOracle: String =
    """SELECT l_orderkey, l_linenumber, measure,
      |       floor(amount * 10000.0 + 0.5) / 10000.0 AS amount4
      |FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS amount
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      |  FROM lineitem WHERE l_orderkey < 100
      |)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** q59 — array aggregation: the distinct users per event type as a SORTED
    * list (collect_set is order-nondeterministic by contract; sort_array
    * restores a total order before the join to string). The list itself is
    * emitted as CSV so the oracle compare stays a plain string column.
    */
  def arrayAgg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .filter(col("user_id") < 15)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        concat_ws(",", sort_array(collect_set(col("user_id")))).as("users_csv"))
      .orderBy(col("event_type"))
  }

  val arrayAggOracle: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS n_users,
      |       array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users_csv
      |FROM events
      |WHERE user_id < 15
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q60 — correlated scalar subquery, via the SQL surface: Catalyst
    * decorrelates the per-row subquery into an aggregate + (outer) join
    * (SURVEY §4.2 subquery-decorrelation row), so the executed plan is a
    * join, not N point lookups — the property that makes this shape viable
    * at 100 TB. The oracle runs the identical SQL.
    */
  def correlatedSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_q60")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_q60")
    spark.sql(
      """SELECT c_custkey, c_mktsegment,
        |       (SELECT count(*) FROM orders_q60 WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer_q60
        |WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin)
  }

  val correlatedSubqueryOracle: String =
    """SELECT c_custkey, c_mktsegment,
      |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin

  /** q74 — anomaly detection by per-group z-score: events whose value sits
    * furthest (in σ units) from their event-type mean. The group moments come
    * from the same exact scaled-long sums as [[valueStats]] (never
    * `stddev()` — engine-specific accumulation), broadcast back onto the
    * stream as a tiny per-type table; the ranking key |z| is computed from
    * bit-identical doubles on both engines, ties broken by event_id.
    */
  def zscoreOutliers(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val sv = Det.scaled(col("value"), 2)
    val mean = col("s1") / 100.0 / col("n")
    val vari = col("s2") / 10000.0 / col("n") - mean * mean
    val stats = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(sv).as("s1"), sum(sv * sv).as("s2"))
      .select(col("event_type"), mean.as("mean"), sqrt(vari).as("sd"))
    val z = (col("value") - col("mean")) / col("sd")
    Tables.events(spark, sfDir)
      // sd = 0 (a constant-valued event type) must drop the group on BOTH
      // engines: Spark double division yields ±Inf/NaN (sorting FIRST under
      // abs DESC) where DuckDB yields NULL (sorting LAST) — the ranking is
      // only engine-independent over rows where z is defined.
      .join(broadcast(stats.filter(col("sd") > 0)), "event_type")
      .select(col("event_id"), col("event_type"),
        Det.display(col("value"), 4).as("value4"), z.as("z"))
      .orderBy(abs(col("z")).desc, col("event_id").asc)
      .limit(k)
      .select(col("event_id"), col("event_type"), col("value4"),
        Det.display(col("z"), 4).as("z4"))
  }

  def zscoreOutliersOracle(k: Int = 20): String = {
    val s1 = s"CAST(sum(${Det.sqlScaled("value", 2)}) AS BIGINT)"
    val s2 = s"CAST(sum(${Det.sqlScaled("value", 2)} * ${Det.sqlScaled("value", 2)}) AS BIGINT)"
    s"""WITH stats AS (
       |  SELECT event_type,
       |         $s1 / 100.0 / count(*) AS mean,
       |         sqrt($s2 / 10000.0 / count(*)
       |              - ($s1 / 100.0 / count(*)) * ($s1 / 100.0 / count(*))) AS sd
       |  FROM events GROUP BY event_type)
       |SELECT event_id, event_type,
       |       floor(value * 10000.0 + 0.5) / 10000.0 AS value4,
       |       floor((value - mean) / sd * 10000.0 + 0.5) / 10000.0 AS z4
       |FROM events JOIN stats USING (event_type)
       |WHERE sd > 0
       |ORDER BY abs((value - mean) / sd) DESC, event_id ASC
       |LIMIT $k""".stripMargin
  }

  /** q76 — value histogram via `width_bucket` (10 equal bins over [0, 500)
    * + underflow/overflow buckets): the binning primitive behind
    * distribution dashboards, as one hash aggregate. Bin edges are exact
    * doubles (500/10 = 50), so bucket assignment is bit-deterministic; the
    * oracle spells the same function as floor arithmetic (DuckDB has no
    * width_bucket).
    */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        col("event_type"),
        expr("width_bucket(value, 0D, 500D, 10)").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))

  val valueHistogramOracle: String =
    """SELECT event_type,
      |       CASE WHEN value < 0 THEN 0
      |            WHEN value >= 500 THEN 11
      |            ELSE CAST(floor(value / 50) AS BIGINT) + 1 END AS bucket,
      |       count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, bucket""".stripMargin

  /** One shared k for q74's query AND oracle — they must never drift. */
  private val ZscoreK = 20

  /** q94 — ANALYZE-style per-column statistics over `orders` (row count,
    * null count, exact distinct count, numeric min/max): the stats a
    * cost-based optimizer ingests and the first profiling query every
    * pipeline runs on a new table. String columns report null min/max —
    * engine-to-engine string rendering of numerics is the classic hash-gate
    * trap, so numeric bounds stay DOUBLE typed end-to-end.
    *
    * Scale shape (100 TB): one pruned single-column aggregate per column,
    * unioned. This is DELIBERATELY not one wide aggregate: five exact
    * countDistincts in a single agg plan a 6-way EXPAND of the full row
    * stream (every row multiplied per distinct-aggregate before the
    * shuffle), while the per-column branches each expand only their own
    * column — and with columnar storage, five single-column scans read the
    * SAME total bytes as one five-column scan. Measured at sf0.1: wide
    * aggregate + collect 1.7 s, per-column union 0.13 s. (Previously this
    * relied on Catalyst pruning the branches of a shared wide aggregate —
    * same executed plan, but per the r4 advisory the claim deserved to be
    * structural, not optimizer-dependent.)
    */
  def columnStats(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strings = Seq("o_orderstatus", "o_orderpriority")
    val branches = (numeric ++ strings).map { c =>
      val bounds =
        if (numeric.contains(c))
          Seq(min(col(c)).cast("double").as("min_val"),
            max(col(c)).cast("double").as("max_val"))
        else Seq(lit(null).cast("double").as("min_val"),
          lit(null).cast("double").as("max_val"))
      val aggs = Seq(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct")) ++ bounds
      o.select(col(c)).agg(aggs.head, aggs.tail: _*)
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
    branches.reduce(_.unionByName(_)).orderBy(col("column"))
  }

  val columnStatsOracle: String = {
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strings = Seq("o_orderstatus", "o_orderpriority")
    (numeric.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
         |FROM orders""".stripMargin) ++
      strings.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val
           |FROM orders""".stripMargin))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_column_stats" -> (columnStats _),
    "q76_value_histogram" -> (valueHistogram _),
    "q74_zscore_outliers" -> ((s: SparkSession, d: String) => zscoreOutliers(s, d, ZscoreK)),
    "q57_pivot" -> (pivotEvents _),
    "q58_unpivot" -> (unpivotLineitem _),
    "q59_array_agg" -> (arrayAgg _),
    "q60_correlated_subquery" -> (correlatedSubquery _),
    "q54_percentiles" -> (percentiles _),
    "q185_percentile_ranks" -> ((s: SparkSession, d: String) => percentileRanks(s, d)),
    "q190_t_test" -> ((s: SparkSession, d: String) => tTest(s, d)),
    "q55_rank_distribution" -> (rankDistribution _),
    "q56_value_stats" -> (valueStats _))

  val oracles: Map[String, String] = Map(
    "q94_column_stats" -> columnStatsOracle,
    "q76_value_histogram" -> valueHistogramOracle,
    "q74_zscore_outliers" -> zscoreOutliersOracle(ZscoreK),
    "q57_pivot" -> pivotEventsOracle,
    "q58_unpivot" -> unpivotLineitemOracle,
    "q59_array_agg" -> arrayAggOracle,
    "q60_correlated_subquery" -> correlatedSubqueryOracle,
    "q54_percentiles" -> percentilesOracle,
    "q185_percentile_ranks" -> percentileRanksOracle(),
    "q190_t_test" -> tTestOracle(),
    "q55_rank_distribution" -> rankDistributionOracle,
    "q56_value_stats" -> valueStatsOracle)
}
