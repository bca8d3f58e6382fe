package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational ✪ operator queries (SURVEY.md §2.B) over the TPC-H-ish star
  * schema. Each query is declared with the DataFrame API so Catalyst handles
  * pushdown, pruning, and join selection; every query has a matching DuckDB
  * oracle in the paired `*Oracle` string.
  *
  * Determinism discipline (SURVEY §5.2): total ordering on a unique key in
  * every output; money sums via Det's scaled-integer arithmetic; explicit
  * NULLS FIRST in rollup/cube orderings (DuckDB defaults NULLS LAST, Spark
  * NULLS FIRST); computed ints cast to bigint on both sides.
  *
  * Scale notes: nation/region (25/5 rows) always broadcast — Catalyst does
  * this automatically under the broadcast threshold, `broadcast()` hints make
  * it explicit. lineitem⋈orders/customer are shuffle joins on their keys, the
  * correct plan at 100 TB; aggregations are partial+final hash aggregates.
  */
object Relational {

  /** q01 — hash aggregate, partial+final: pricing summary by flag/status. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Det.exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
        Det.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Det.exactAvg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummaryOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       sum(l_quantity) AS sum_qty,
       |       ${Det.sqlExactSum("l_extendedprice", 2)} AS sum_base_price,
       |       ${Det.sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |       ${Det.sqlExactAvg("l_discount", 4)} AS avg_disc,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — broadcast hash join chain: revenue by region/nation. The dim
    * chain (supplier⋈nation⋈region) is tiny → broadcast to the lineitem scan;
    * one shuffle for the final 25-group aggregate.
    */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    // Hint only the genuinely constant-size tables (region=5, nation=25
    // rows). supplier grows with SF — at 100× a forced broadcast would exceed
    // executor memory, so its join stays size-based — but the fact side must
    // join supplier's SCAN directly (r14): the previous lineitem⋈(sup⋈nat⋈reg)
    // shape compared the pruned lineitem scan against a 3-way-join ESTIMATE
    // (join stats are size products, always huge), and Catalyst broadcast
    // LINEITEM — the fact table — as the "smaller" side (BuildLeft in the
    // executed plan; collect-to-driver of every lineitem row). Joining
    // scan-vs-scan the comparison is honest at every SF: broadcast supplier
    // at gate scale, SMJ when supplier outgrows the threshold.
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Det.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationOracle: String =
    s"""SELECT r_name, n_name,
       |       ${Det.sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
       |       count(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** q03 — shuffle (sort-merge) join + top-k: top 20 customers by order
    * total. orders⋈customer is the big equi-join Catalyst plans as SMJ/SHJ.
    */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val totals = ord.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice"), 2).as("total_spent"))
    totals
      .join(cust, totals("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total_spent"))
      .orderBy(col("total_spent").desc, col("c_custkey").asc)
      .limit(20)
  }

  val topCustomersOracle: String =
    s"""SELECT c_custkey, c_name, n_orders, total_spent
       |FROM (
       |  SELECT o_custkey, count(*) AS n_orders,
       |         ${Det.sqlExactSum("o_totalprice", 2)} AS total_spent
       |  FROM orders GROUP BY o_custkey
       |) t JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_spent DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  /** q04 — left-semi join (EXISTS): customers holding at least one open
    * ('O') order, counted per market segment.
    */
  def semiJoinSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val open = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O")
    cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val semiJoinSegmentsOracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q05 — left-anti join (NOT EXISTS): customers with no pending ('P')
    * orders. (Every customer has *some* order in the fixtures, so the filter
    * keeps the gate non-trivial.)
    */
  def antiJoinCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val pend = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "P")
    cust.join(pend, cust("c_custkey") === pend("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinCustomersOracle: String =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** q06 — theta (range) join against a tiny inline bands table: parts
    * bucketed into retail-price bands. BroadcastNestedLoopJoin with the
    * 4-row side broadcast — the only sane physical plan for a non-equi
    * condition, and safe because one side is constant-size.
    */
  def priceBands(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    val bands = spark.createDataFrame(Seq(
      ("b1_under_925", 0.0, 925.0),
      ("b2_925_950", 925.0, 950.0),
      ("b3_950_975", 950.0, 975.0),
      ("b4_975_up", 975.0, 1e18))).toDF("band", "lo", "hi")
    part.join(broadcast(bands),
        part("p_retailprice") >= bands("lo") && part("p_retailprice") < bands("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_parts"),
        Det.exactSum(col("p_retailprice"), 2).as("sum_price"))
      .orderBy(col("band"))
  }

  val priceBandsOracle: String =
    s"""SELECT band, count(*) AS n_parts,
       |       ${Det.sqlExactSum("p_retailprice", 2)} AS sum_price
       |FROM part
       |JOIN (VALUES ('b1_under_925', 0.0, 925.0),
       |             ('b2_925_950', 925.0, 950.0),
       |             ('b3_950_975', 950.0, 975.0),
       |             ('b4_975_up', 975.0, 1e18)) AS bands(band, lo, hi)
       |  ON p_retailprice >= lo AND p_retailprice < hi
       |GROUP BY band
       |ORDER BY band""".stripMargin

  /** q07 — rollup: revenue at (region, nation), (region), and grand-total
    * grouping levels.
    */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    // Same hint discipline as q02: broadcast only nation/region; customer
    // scales with SF, so its join is left to size-based selection + AQE —
    // and, as in q02 (r14), the fact joins customer's SCAN directly so the
    // size comparison is scan-vs-scan: the previous orders⋈(cust⋈nat⋈reg)
    // shape made Catalyst broadcast ORDERS against the inflated dim-chain
    // join estimate (BuildLeft fact broadcast in the executed plan).
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice"), 2).as("revenue"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val rollupRevenueOracle: String =
    s"""SELECT r_name, n_name, count(*) AS n_orders,
       |       ${Det.sqlExactSum("o_totalprice", 2)} AS revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** q08 — cube over order status × priority. */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice"), 2).as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  val cubeOrdersOracle: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       |       ${Det.sqlExactSum("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** q10 — explicit GROUPING SETS (beyond rollup/cube): order stats at
    * (status), (priority), and () grouping levels, via the SQL surface.
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_gs")
    spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |       ${Det.sqlExactSumSpark("o_totalprice", 2)} AS revenue
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val groupingSetsOracle: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       |       ${Det.sqlExactSum("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** q11 — RANGE frame window: for each order, revenue of the customer's
    * orders within ±100.0 of its price (value-range frame, not row frame).
    */
  def rangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    // the DataFrame API's rangeBetween only accepts Long offsets; fractional
    // value ranges go through the SQL frame syntax
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_rf")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |                      RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS n_near
        |FROM orders_rf
        |ORDER BY o_orderkey""".stripMargin)
  }

  val rangeFrameOracle: String =
    """SELECT o_orderkey, o_custkey,
      |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |                      RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS n_near
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q09 — ranking window: top-3 orders per customer by price. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val topOrdersPerCustomerOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       CAST(row_number() OVER (PARTITION BY o_custkey
      |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
      |FROM orders
      |QUALIFY rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** q12 — global sort + limit (TakeOrderedAndProject): 10 priciest orders. */
  def globalTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val globalTopOrdersOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** q13 — intersect: users who both purchased and clicked. */
  def intersectUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "purchase" && col("value") > 200).select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "click" && col("value") > 200).select(col("user_id")))
      .orderBy(col("user_id"))
  }

  val intersectUsersOracle: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'click' AND value > 200
      |ORDER BY user_id""".stripMargin

  /** q14 — except: users with a big (>200) purchase but no big click. */
  def exceptUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "purchase" && col("value") > 200).select(col("user_id"))
      .except(ev.filter(col("event_type") === "click" && col("value") > 200).select(col("user_id")))
      .orderBy(col("user_id"))
  }

  val exceptUsersOracle: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'click' AND value > 200
      |ORDER BY user_id""".stripMargin

  /** q15 — union distinct: users who signed up or errored. */
  def unionUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "signup" && col("value") > 200).select(col("user_id"))
      .union(ev.filter(col("event_type") === "error" && col("value") > 200).select(col("user_id")))
      .distinct()
      .orderBy(col("user_id"))
  }

  val unionUsersOracle: String =
    """SELECT user_id FROM events WHERE event_type = 'signup' AND value > 200
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
      |ORDER BY user_id""".stripMargin

  /** q16 — distinct aggregate: nation fan-out per market segment. */
  def distinctNations(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val distinctNationsOracle: String =
    """SELECT c_mktsegment,
      |       count(DISTINCT c_nationkey) AS n_nations,
      |       count(*) AS n_customers
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q18 — date/time functions: monthly order volume and revenue. */
  def monthlyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice"), 2).as("revenue"))
      .orderBy(col("yr"), col("mth"))
  }

  val monthlyRevenueOracle: String =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |       CAST(month(o_orderdate) AS INTEGER) AS mth,
       |       count(*) AS n_orders,
       |       ${Det.sqlExactSum("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY yr, mth""".stripMargin

  /** q177 — PIPELINE AGGREGATIONS over the q18 date histogram (ES
    * `cumulative_sum` + `derivative` pipeline aggs): monthly revenue with
    * its running total and month-over-month delta — the dashboard trio ES
    * computes as second-pass aggs over histogram buckets. Expressed as
    * windows over the MONTH-CARDINALITY aggregate, never the fact table:
    * the corpus-sized work is the one grouped sum (map-side partials); the
    * unpartitioned window then scans bucket rows only — bounded by the
    * date span (a century is 1,200 rows), the PlanLintSpec whitelist
    * justification. Sums stay scaled BIGINT (the [[Det]] discipline)
    * through BOTH aggregation levels — the running total is a sum over
    * already-exact month sums — with the single double division at the end,
    * so cumulative values are bitwise identical under any partitioning.
    */
  def pipelineAggs(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(sum(Det.scaled(col("o_totalprice"), 2)).as("rev_c"))
    val w = Window.orderBy(col("yr"), col("mth"))
    m.withColumn("cum_c",
        sum(col("rev_c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
      .select(
        col("yr"), col("mth"),
        (col("rev_c") / 100.0).as("revenue"),
        (col("cum_c") / 100.0).as("cum_revenue"),
        ((col("rev_c") - col("prev_c")) / 100.0).as("mom_delta"))
      .orderBy(col("yr"), col("mth"))
  }

  val pipelineAggsOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |         CAST(month(o_orderdate) AS INTEGER) AS mth,
       |         CAST(sum(${Det.sqlScaled("o_totalprice", 2)}) AS BIGINT)
       |           AS rev_c
       |  FROM orders GROUP BY 1, 2)
       |SELECT yr, mth,
       |       rev_c / 100.0 AS revenue,
       |       CAST(sum(rev_c) OVER (ORDER BY yr, mth ROWS UNBOUNDED PRECEDING)
       |         AS BIGINT) / 100.0 AS cum_revenue,
       |       (rev_c - lag(rev_c) OVER (ORDER BY yr, mth)) / 100.0
       |         AS mom_delta
       |FROM m ORDER BY yr, mth""".stripMargin

  /** q198 — MOVING-FUNCTION + SERIAL-DIFFERENCING pipeline aggs (ES
    * `moving_fn` with `MovingFunctions.unweightedAvg`/`max`, and
    * `serial_diff` with `lag=12`): the q177 family's remaining two members.
    * ES `moving_fn` at shift=0 windows over the PRECEDING `window` buckets,
    * EXCLUDING the current one — pinned here as `rowsBetween(-3, -1)`; a
    * partial head window averages the buckets it has (ES `unweightedAvg`
    * skips missing values), and the very first bucket, with an empty
    * window, is NULL. `serial_diff` lag=12 is the year-over-year delta,
    * NULL until 12 buckets of history exist.
    *
    * Same scale shape as q177: the corpus-sized work is ONE grouped sum
    * with map-side partials; the unpartitioned windows then scan
    * month-cardinality bucket rows only (PlanLintSpec-whitelisted bound).
    * Month sums stay scaled BIGINT through every window — the moving sum
    * and serial difference are integer arithmetic over exact bucket sums —
    * with one double division per output column at the end.
    */
  def movingFnAggs(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(sum(Det.scaled(col("o_totalprice"), 2)).as("rev_c"))
    val w = Window.orderBy(col("yr"), col("mth"))
    val trailing = w.rowsBetween(-3, -1)
    m.withColumn("mov_sum_c", sum(col("rev_c")).over(trailing))
      .withColumn("mov_n", count(col("rev_c")).over(trailing))
      .withColumn("mov_max_c", max(col("rev_c")).over(trailing))
      .withColumn("lag12_c", lag(col("rev_c"), 12).over(w))
      .select(
        col("yr"), col("mth"),
        (col("rev_c") / 100.0).as("revenue"),
        Det.display(col("mov_sum_c") / col("mov_n") / 100.0, 4).as("mov_avg_3"),
        (col("mov_max_c") / 100.0).as("mov_max_3"),
        ((col("rev_c") - col("lag12_c")) / 100.0).as("yoy_delta"))
      .orderBy(col("yr"), col("mth"))
  }

  val movingFnAggsOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |         CAST(month(o_orderdate) AS INTEGER) AS mth,
       |         CAST(sum(${Det.sqlScaled("o_totalprice", 2)}) AS BIGINT)
       |           AS rev_c
       |  FROM orders GROUP BY 1, 2)
       |SELECT yr, mth,
       |       rev_c / 100.0 AS revenue,
       |       floor(CAST(sum(rev_c) OVER w3 AS BIGINT)
       |             / CAST(count(rev_c) OVER w3 AS BIGINT) / 100.0
       |             * 10000.0 + 0.5) / 10000.0
       |         AS mov_avg_3,
       |       max(rev_c) OVER w3 / 100.0 AS mov_max_3,
       |       (rev_c - lag(rev_c, 12) OVER (ORDER BY yr, mth)) / 100.0
       |         AS yoy_delta
       |FROM m
       |WINDOW w3 AS (ORDER BY yr, mth ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
       |ORDER BY yr, mth""".stripMargin

  /** q205 — STATS BUCKET (ES `stats_bucket` sibling pipeline agg): the
    * min / max / avg / sum / count OF the monthly-revenue histogram's
    * bucket values — the second-pass summary ES computes over a sibling
    * aggregation's buckets. Two-level exactness: month sums are scaled
    * BIGINT (the q177 discipline) and the bucket-level reduction is again
    * integer min/max/sum with ONE double division each for presentation —
    * so the whole pipeline is order-independent. The bucket reduction
    * input is month-cardinality, not corpus-cardinality.
    */
  def statsBucket(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(sum(Det.scaled(col("o_totalprice"), 2)).as("rev_c"))
      .agg(
        count(lit(1)).as("n_buckets"),
        min(col("rev_c")).as("min_c"), max(col("rev_c")).as("max_c"),
        sum(col("rev_c")).as("sum_c"))
      .select(
        col("n_buckets"),
        (col("min_c") / 100.0).as("min_revenue"),
        (col("max_c") / 100.0).as("max_revenue"),
        Det.display(col("sum_c") / col("n_buckets") / 100.0, 4).as("avg_revenue"),
        (col("sum_c") / 100.0).as("sum_revenue"))

  val statsBucketOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(sum(${Det.sqlScaled("o_totalprice", 2)}) AS BIGINT)
       |           AS rev_c
       |  FROM orders GROUP BY year(o_orderdate), month(o_orderdate))
       |SELECT count(*) AS n_buckets,
       |       CAST(min(rev_c) AS BIGINT) / 100.0 AS min_revenue,
       |       CAST(max(rev_c) AS BIGINT) / 100.0 AS max_revenue,
       |       floor(CAST(sum(rev_c) AS BIGINT) / count(*) / 100.0
       |             * 10000.0 + 0.5) / 10000.0
       |         AS avg_revenue,
       |       CAST(sum(rev_c) AS BIGINT) / 100.0 AS sum_revenue
       |FROM m""".stripMargin

  /** q206 — BUCKET SELECTOR (ES `bucket_selector` pipeline agg): keep only
    * the histogram buckets whose value passes a script predicate against a
    * SIBLING pipeline value — here, months whose revenue exceeds 110% of
    * the average monthly revenue (the "which periods overperformed"
    * filter). The cross-bucket comparison is the 1-row stats aggregate
    * broadcast back into the month-cardinality bucket frame, so the
    * predicate is evaluated with EXACT integer cross-multiplication
    * (10 · rev_c > 11 · sum_c / n is re-formed as
    * 10 · n · rev_c > 11 · sum_c — no ratio ever floats). Both legs are
    * aggregates of the same one corpus scan; nothing corpus-sized joins.
    */
  def bucketSelector(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(sum(Det.scaled(col("o_totalprice"), 2)).as("rev_c"))
    val tot = m.agg(
      count(lit(1)).as("nb"), sum(col("rev_c")).as("tot_c"))
    m.crossJoin(broadcast(tot))
      .filter(lit(10L) * col("nb") * col("rev_c") > lit(11L) * col("tot_c"))
      .select(col("yr"), col("mth"), (col("rev_c") / 100.0).as("revenue"))
      .orderBy(col("yr"), col("mth"))
  }

  val bucketSelectorOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |         CAST(month(o_orderdate) AS INTEGER) AS mth,
       |         CAST(sum(${Det.sqlScaled("o_totalprice", 2)}) AS BIGINT)
       |           AS rev_c
       |  FROM orders GROUP BY 1, 2),
       |t AS (SELECT count(*) AS nb, CAST(sum(rev_c) AS BIGINT) AS tot_c FROM m)
       |SELECT yr, mth, rev_c / 100.0 AS revenue
       |FROM m, t
       |WHERE 10 * nb * rev_c > 11 * tot_c
       |ORDER BY yr, mth""".stripMargin

  /** q183 — WEIGHTED AVERAGE aggregation (ES `weighted_avg`): per-flag
    * quantity-weighted mean unit price. The [[Det]] discipline extended to
    * a ratio of sums: numerator Σ price_cents·qty and denominator Σ qty are
    * both exact BIGINT sums (order-independent under any partitioning), and
    * the weighted mean is ONE double division at the end — never a running
    * float accumulation. Overflow bound: cents ≤ ~10^7, qty ≤ 50 → ~5·10^8
    * per row, inside BIGINT to ~10^10 rows per group; past that, the
    * DECIMAL(38,0) valve (the q116 note).
    */
  def weightedAvg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(Det.scaled(col("l_extendedprice"), 2) *
          Det.scaled(col("l_quantity"), 0)).as("num_c"),
        sum(Det.scaled(col("l_quantity"), 0)).as("qty"))
      .select(
        col("l_returnflag"), col("qty"),
        Det.display(col("num_c") / col("qty") / 100.0, 4).as("weighted_avg_price"))
      .orderBy(col("l_returnflag"))

  val weightedAvgOracle: String =
    s"""SELECT l_returnflag,
       |       CAST(sum(${Det.sqlScaled("l_quantity", 0)}) AS BIGINT) AS qty,
       |       floor(CAST(sum(${Det.sqlScaled("l_extendedprice", 2)} *
       |                      ${Det.sqlScaled("l_quantity", 0)}) AS BIGINT)
       |             / CAST(sum(${Det.sqlScaled("l_quantity", 0)}) AS BIGINT)
       |             / 100.0 * 10000.0 + 0.5) / 10000.0 AS weighted_avg_price
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** q24 — math + CASE WHEN: per-brand price-tier stats. sqrt is IEEE
    * correctly-rounded on both engines, so per-row scaled rounding is exact.
    */
  def brandTiers(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    val tier = when(col("p_retailprice") < 800, "low")
      .when(col("p_retailprice") < 1600, "mid")
      .otherwise("high")
    part.withColumn("tier", tier)
      .groupBy(col("p_brand"), col("tier"))
      .agg(
        count(lit(1)).as("n_parts"),
        Det.exactSum(sqrt(col("p_retailprice")), 4).as("sum_sqrt_price"),
        sum(col("p_size").cast("long")).as("sum_size"))
      .orderBy(col("p_brand"), col("tier"))
  }

  val brandTiersOracle: String =
    s"""SELECT p_brand,
       |       CASE WHEN p_retailprice < 800 THEN 'low'
       |            WHEN p_retailprice < 1600 THEN 'mid'
       |            ELSE 'high' END AS tier,
       |       count(*) AS n_parts,
       |       ${Det.sqlExactSum("sqrt(p_retailprice)", 4)} AS sum_sqrt_price,
       |       CAST(sum(p_size) AS BIGINT) AS sum_size
       |FROM part
       |GROUP BY 1, 2
       |ORDER BY p_brand, tier""".stripMargin

  /** q17 — HLL sketch aggregate (no SQL oracle — approximate by design;
    * RelationalSpec bounds the error vs the exact count): distinct users per
    * event type via `approx_count_distinct`, the constant-memory path for
    * count-distinct at 100 TB.
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_approx_distinct" -> (approxDistinct _),
    "q10_grouping_sets" -> (groupingSets _),
    "q11_range_frame" -> (rangeFrame _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_revenue_by_nation" -> (revenueByNation _),
    "q03_top_customers" -> (topCustomers _),
    "q04_semi_join_segments" -> (semiJoinSegments _),
    "q05_anti_join_customers" -> (antiJoinCustomers _),
    "q06_price_bands" -> (priceBands _),
    "q07_rollup_revenue" -> (rollupRevenue _),
    "q08_cube_orders" -> (cubeOrders _),
    "q09_top_orders_per_customer" -> (topOrdersPerCustomer _),
    "q12_global_top_orders" -> (globalTopOrders _),
    "q13_intersect_users" -> (intersectUsers _),
    "q14_except_users" -> (exceptUsers _),
    "q15_union_users" -> (unionUsers _),
    "q16_distinct_nations" -> (distinctNations _),
    "q18_monthly_revenue" -> (monthlyRevenue _),
    "q177_pipeline_aggs" -> (pipelineAggs _),
    "q198_moving_fn" -> (movingFnAggs _),
    "q205_stats_bucket" -> (statsBucket _),
    "q206_bucket_selector" -> (bucketSelector _),
    "q183_weighted_avg" -> (weightedAvg _),
    "q24_brand_tiers" -> (brandTiers _))

  val oracles: Map[String, String] = Map(
    "q10_grouping_sets" -> groupingSetsOracle,
    "q11_range_frame" -> rangeFrameOracle,
    "q01_pricing_summary" -> pricingSummaryOracle,
    "q02_revenue_by_nation" -> revenueByNationOracle,
    "q03_top_customers" -> topCustomersOracle,
    "q04_semi_join_segments" -> semiJoinSegmentsOracle,
    "q05_anti_join_customers" -> antiJoinCustomersOracle,
    "q06_price_bands" -> priceBandsOracle,
    "q07_rollup_revenue" -> rollupRevenueOracle,
    "q08_cube_orders" -> cubeOrdersOracle,
    "q09_top_orders_per_customer" -> topOrdersPerCustomerOracle,
    "q12_global_top_orders" -> globalTopOrdersOracle,
    "q13_intersect_users" -> intersectUsersOracle,
    "q14_except_users" -> exceptUsersOracle,
    "q15_union_users" -> unionUsersOracle,
    "q16_distinct_nations" -> distinctNationsOracle,
    "q18_monthly_revenue" -> monthlyRevenueOracle,
    "q177_pipeline_aggs" -> pipelineAggsOracle,
    "q198_moving_fn" -> movingFnAggsOracle,
    "q205_stats_bucket" -> statsBucketOracle,
    "q206_bucket_selector" -> bucketSelectorOracle,
    "q183_weighted_avg" -> weightedAvgOracle,
    "q24_brand_tiers" -> brandTiersOracle)
}
