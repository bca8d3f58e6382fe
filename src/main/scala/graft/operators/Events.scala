package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time analytics over `events` — batch stand-ins for the streaming
  * operator family (SURVEY.md §2.B streaming table): tumbling / sliding /
  * session windows, watermark-style dedup, lag/lead and frame aggregates,
  * JSON extraction. The same transformations run unchanged on a
  * `readStream` source (see [[graft.streaming.Streams]]); the driver gates
  * are batch-only so these are gated here on the static table.
  *
  * Determinism: timestamps never leave as raw TimestampType — they are
  * formatted (hour-grain) or converted to epoch micros (session starts), and
  * every output ends in a total order (SURVEY §5.2).
  */
object Events {

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** q40 — tumbling window: hourly counts + revenue per event type, via
    * Spark's `window()` event-time operator (epoch-aligned, same boundaries
    * as date_trunc).
    */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.exactSum(col("value"), 2).as("sum_value"))
      .select(fmt(col("w.start")).as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  val tumblingOracle: String =
    s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
       |       event_type, count(*) AS n,
       |       ${Det.sqlExactSum("value", 2)} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  /** q41 — sliding window (1 h window, 15 min slide): each event lands in 4
    * overlapping windows.
    */
  def sliding(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(fmt(col("w.start")).as("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))
  }

  val slidingOracle: String =
    """SELECT strftime(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
      |                - (k * INTERVAL '15 minutes'), '%Y-%m-%d %H:%M:%S') AS win_start,
      |       event_type, count(*) AS n
      |FROM events
      |CROSS JOIN (VALUES (0), (1), (2), (3)) AS g(k)
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  /** q42 — session window (30 min gap) per user, via Spark's
    * `session_window` operator. Output keys on the session's first event
    * (epoch micros) so no raw timestamp crosses the oracle boundary; the
    * DuckDB side derives sessions with the classic gaps-and-islands
    * (lag + running sum) formulation.
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.exactSum(col("value"), 2).as("sum_value"),
        min(col("event_id")).as("first_event_id"),
        unix_micros(min(col("ts"))).as("sess_start_us"))
      .select(col("user_id"), col("sess_start_us"), col("n_events"),
        col("sum_value"), col("first_event_id"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }

  val sessionsOracle: String =
    s"""WITH e0 AS (
       |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
       |), e AS (
       |  SELECT *,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM e0
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), s AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM e
       |)
       |SELECT user_id, epoch_us(min(ts)) AS sess_start_us, count(*) AS n_events,
       |       ${Det.sqlExactSum("value", 2)} AS sum_value,
       |       min(event_id) AS first_event_id
       |FROM s
       |GROUP BY user_id, sess
       |ORDER BY user_id, sess_start_us""".stripMargin

  /** q43 — deterministic dedup: first event per (user, event_type) by
    * (ts, event_id). This is `dropDuplicates` made reproducible — the batch
    * analog of `dropDuplicatesWithinWatermark`.
    */
  def dedupFirstEvent(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), fmt(col("ts")).as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val dedupFirstEventOracle: String =
    """SELECT user_id, event_type, event_id,
      |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS first_ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** q44 — analytic windows (lag + lead): per-user deltas to the previous
    * and next event values.
    */
  def lagDeltas(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("delta", Det.display(col("value") - lag(col("value"), 1).over(w), 4))
      .withColumn("next_delta", Det.display(lead(col("value"), 1).over(w) - col("value"), 4))
      .select(col("event_id"), col("user_id"), col("delta"), col("next_delta"))
      .orderBy(col("event_id"))
  }

  val lagDeltasOracle: String =
    """SELECT event_id, user_id,
      |       floor((value - lag(value, 1) OVER w) * 10000.0 + 0.5) / 10000.0 AS delta,
      |       floor((lead(value, 1) OVER w - value) * 10000.0 + 0.5) / 10000.0 AS next_delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin

  /** q45 — frame spec (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): 3-event
    * moving average per user.
    */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("mov_avg", Det.display(avg(col("value")).over(w), 4))
      .select(col("event_id"), col("user_id"), col("mov_avg"))
      .orderBy(col("event_id"))
  }

  val movingAvgOracle: String =
    """SELECT event_id, user_id,
      |       floor(avg(value) OVER (PARTITION BY user_id
      |             ORDER BY CAST(ts AS TIMESTAMP), event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000.0 + 0.5)
      |         / 10000.0 AS mov_avg
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q46 — JSON extraction (semi-structured props column): average embedded
    * counter per event type.
    */
  def jsonKpis(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")) / count(col("k"))).as("avg_k"))
      .orderBy(col("event_type"))
  }

  val jsonKpisOracle: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |         / count(json_extract_string(props, '$.k')) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q48 — MapType + from_json: parse the props JSON into a map column and
    * aggregate over exploded map entries (SURVEY §2.B map-functions row —
    * the fixtures carry no native map column, so one is derived).
    */
  def mapFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    Tables.events(spark, sfDir)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .select(col("event_type"), explode(col("m")).as(Seq("k", "v")))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .orderBy(col("event_type"), col("k"))
  }

  val mapFunctionsOracle: String =
    """WITH kv AS (
      |  SELECT event_type, unnest(json_keys(props)) AS k, props FROM events
      |)
      |SELECT event_type, k, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM kv
      |GROUP BY 1, 2
      |ORDER BY event_type, k""".stripMargin

  /** q73 — funnel analysis (signup → click → purchase): how many users
    * complete each stage IN ORDER, judged on each user's FIRST event of each
    * type. One hash aggregate over (user, conditional-min timestamps), then
    * one global roll-up — no joins, no self-unions; the classic event-
    * analytics query at its cheapest plan shape. Timestamps compare as
    * integer microseconds (exact on both engines).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val firsts = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", us)).as("s"),
        min(when(col("event_type") === "click", us)).as("c"),
        min(when(col("event_type") === "purchase", us)).as("p"))
    firsts.agg(
      count(col("s")).as("n_signup"),
      count(when(col("s") < col("c"), lit(1))).as("n_click_after_signup"),
      count(when(col("s") < col("c") && col("c") < col("p"), lit(1))).as("n_full_funnel"))
  }

  val funnelOracle: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |         min(epoch_us(CAST(ts AS TIMESTAMP))) FILTER (event_type = 'signup') AS s,
      |         min(epoch_us(CAST(ts AS TIMESTAMP))) FILTER (event_type = 'click') AS c,
      |         min(epoch_us(CAST(ts AS TIMESTAMP))) FILTER (event_type = 'purchase') AS p
      |  FROM events GROUP BY user_id)
      |SELECT count(s) AS n_signup,
      |       count(CASE WHEN s < c THEN 1 END) AS n_click_after_signup,
      |       count(CASE WHEN s < c AND c < p THEN 1 END) AS n_full_funnel
      |FROM firsts""".stripMargin

  /** q75 — cohort retention: users grouped by their first-activity day
    * (cohort), counted on each later active day as a day-offset matrix —
    * the standard retention triangle. Two hash aggregates (first day per
    * user, distinct user-days) and one join on user_id; the matrix itself
    * is tiny (days², broadcastable) no matter the corpus size.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    days.distinct()
      .join(cohorts, "user_id")
      .groupBy(col("cohort"), col("day"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast("int").as("day_offset"),
        col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val cohortRetentionOracle: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
      |       CAST(date_diff('day', cohort, day) AS INTEGER) AS day_offset,
      |       count(*) AS n_users
      |FROM days JOIN cohorts USING (user_id)
      |GROUP BY cohort, day
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q203 — TOP METRICS (ES `top_metrics`, size=1): per bucket, the metric
    * values carried by the row that sorts FIRST on the sort field — "the
    * value at the latest event", the freshness readout ES dashboards pin
    * next to an aggregate. ES sorts on one field and returns the metrics
    * of the winning document; a bare `max_by`/`arg_max` is that minus tie
    * determinism, so the operator is the rank-1 window with the explicit
    * (ts, event_id) total order — Spark plans it as WindowGroupLimit
    * (per-partition top-1 BEFORE the exchange, the q09 shape), which is
    * also how a 1000-executor run avoids shuffling anything but each
    * partition's single candidate per bucket.
    */
  def topMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), fmt(col("ts")).as("top_ts"),
        col("event_id").as("top_event_id"), col("value").as("top_value"))
      .orderBy(col("event_type"))
  }

  val topMetricsOracle: String =
    """SELECT event_type,
      |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS top_ts,
      |       event_id AS top_event_id, value AS top_value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
      |ORDER BY event_type""".stripMargin

  /** q204 — DATE RANGE aggregation (ES `date_range`): named, possibly
    * OVERLAPPING half-open [from, to) time buckets, each counting every
    * matching document independently — the contract that distinguishes it
    * from a histogram (a doc can land in two buckets; `first_half`
    * deliberately overlaps `early` and `mid` to pin it). Same shape as
    * q199: per-row bucket flags in the scan, ONE map-side-combined
    * aggregate producing every bucket's count + exact value sum, `stack`
    * unpivot at bucket cardinality. Declaration order is preserved in the
    * output via an explicit ordinal — ES returns ranges as declared, not
    * sorted by key.
    */
  def dateRange(spark: SparkSession, sfDir: String): DataFrame = {
    val ranges = Seq(
      ("early", Some("2024-01-01 00:00:00"), Some("2024-01-10 00:00:00")),
      ("mid", Some("2024-01-10 00:00:00"), Some("2024-01-20 00:00:00")),
      ("late", Some("2024-01-20 00:00:00"), None),
      ("first_half", None, Some("2024-01-15 00:00:00")))
    val ev = Tables.events(spark, sfDir)
    val flagged = ev.select(
      col("value") +: ranges.map { case (name, from, to) =>
        (from.map(f => col("ts") >= lit(f).cast("timestamp"))
          .getOrElse(lit(true)) &&
          to.map(t => col("ts") < lit(t).cast("timestamp"))
            .getOrElse(lit(true))).cast("long").as(s"in_$name")
      }: _*)
    val aggs = ranges.flatMap { case (name, _, _) =>
      Seq(sum(col(s"in_$name")).as(s"n_$name"),
        sum(when(col(s"in_$name") === 1, Det.scaled(col("value"), 2))
          .otherwise(0L)).as(s"v_$name"))
    }
    val stackArgs = ranges.zipWithIndex
      .map { case ((name, _, _), i) =>
        s"$i, '$name', n_$name, v_$name" }
      .mkString(", ")
    flagged.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${ranges.size}, $stackArgs) AS (ord, range_key, doc_count, sum_c)"))
      .select(col("ord"), col("range_key"), col("doc_count"),
        (col("sum_c") / 100.0).as("sum_value"))
      .orderBy(col("ord"))
  }

  val dateRangeOracle: String =
    """WITH f AS (
      |  SELECT value,
      |    CAST(CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
      |     AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-10 00:00:00' AS BIGINT) AS in_early,
      |    CAST(CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
      |     AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-20 00:00:00' AS BIGINT) AS in_mid,
      |    CAST(CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00' AS BIGINT) AS in_late,
      |    CAST(CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-15 00:00:00' AS BIGINT) AS in_first_half
      |  FROM events),
      |c AS (
      |  SELECT CAST(sum(in_early) AS BIGINT) AS n_early,
      |         CAST(sum(CASE WHEN in_early = 1 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_early,
      |         CAST(sum(in_mid) AS BIGINT) AS n_mid,
      |         CAST(sum(CASE WHEN in_mid = 1 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_mid,
      |         CAST(sum(in_late) AS BIGINT) AS n_late,
      |         CAST(sum(CASE WHEN in_late = 1 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_late,
      |         CAST(sum(in_first_half) AS BIGINT) AS n_first_half,
      |         CAST(sum(CASE WHEN in_first_half = 1 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_first_half
      |  FROM f)
      |SELECT ord, range_key, doc_count, sum_c / 100.0 AS sum_value
      |FROM (
      |  SELECT 0 AS ord, 'early' AS range_key, n_early AS doc_count, v_early AS sum_c FROM c
      |  UNION ALL SELECT 1, 'mid', n_mid, v_mid FROM c
      |  UNION ALL SELECT 2, 'late', n_late, v_late FROM c
      |  UNION ALL SELECT 3, 'first_half', n_first_half, v_first_half FROM c)
      |ORDER BY ord""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_top_metrics" -> (topMetrics _),
    "q204_date_range" -> (dateRange _),
    "q73_funnel" -> (funnel _),
    "q75_cohort_retention" -> (cohortRetention _),
    "q48_map_functions" -> (mapFunctions _),
    "q40_tumbling_windows" -> (tumbling _),
    "q41_sliding_windows" -> (sliding _),
    "q42_session_windows" -> (sessions _),
    "q43_dedup_first_event" -> (dedupFirstEvent _),
    "q44_lag_deltas" -> (lagDeltas _),
    "q45_moving_avg" -> (movingAvg _),
    "q46_json_kpis" -> (jsonKpis _))

  val oracles: Map[String, String] = Map(
    "q203_top_metrics" -> topMetricsOracle,
    "q204_date_range" -> dateRangeOracle,
    "q73_funnel" -> funnelOracle,
    "q75_cohort_retention" -> cohortRetentionOracle,
    "q48_map_functions" -> mapFunctionsOracle,
    "q40_tumbling_windows" -> tumblingOracle,
    "q41_sliding_windows" -> slidingOracle,
    "q42_session_windows" -> sessionsOracle,
    "q43_dedup_first_event" -> dedupFirstEventOracle,
    "q44_lag_deltas" -> lagDeltasOracle,
    "q45_moving_avg" -> movingAvgOracle,
    "q46_json_kpis" -> jsonKpisOracle)
}
