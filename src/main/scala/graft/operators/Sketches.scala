package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable sketch aggregates — the approximation toolkit a 100 TB pipeline
  * actually runs when exact answers would need a per-group sort or a
  * corpus-wide distinct. All three families share the property that makes
  * them scale: the partial state is a small fixed-size summary that merges
  * map-side, so the shuffle carries sketches, not rows.
  *
  * No SQL oracles — sketch contents are implementation-defined; each gate is
  * pinned by a SketchesSpec error-bound test against the exact answer, which
  * is the meaningful contract for an approximate operator.
  *
  * Determinism scope: CMS (counter sums) and HLL (register max) merges are
  * exactly commutative — bit-identical under any partitioning, spec-pinned.
  * approx_percentile's t-digest compression IS merge-order sensitive once
  * groups exceed the accuracy parameter, so only its RANK-ERROR BOUND is
  * guaranteed (and spec-pinned), not byte-stability across repartitioning —
  * which is why q65 is a rows-only gate, never hash-compared.
  */
object Sketches {

  /** q65 — t-digest quantiles of event value per type (`approx_percentile`,
    * accuracy 1000 ⇒ rank error ≤ N/1000 per the Spark contract). The 100 TB
    * replacement for [[Stats.percentiles]]' exact per-group sort; emitted at
    * the same (event_type, p50/p90/p99) shape.
    */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 1000)").as("q"))
      .select(
        col("event_type"), col("n"),
        Det.display(element_at(col("q"), 1), 4).as("p50"),
        Det.display(element_at(col("q"), 2), 4).as("p90"),
        Det.display(element_at(col("q"), 3), 4).as("p99"))
      .orderBy(col("event_type"))

  /** q66 — heavy hitters via count-min sketch: one pass builds a fixed-size
    * (eps=0.001, conf=0.99, seeded) sketch of the token stream; every vocab
    * term is then estimated from the ~100 KB summary instead of a second
    * corpus aggregation. CMS guarantees est ≥ true and est ≤ true + eps·N
    * w.p. conf — both bounds asserted in the spec.
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
    // One aggregation pass builds the sketch; deserialize it ONCE here (the
    // result is one row) and probe it from the task closure — a per-row
    // readFrom would re-parse the ~100 KB sketch for every term.
    val row = tok.agg(
      expr("count_min_sketch(t, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("stream_n")).collect()(0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val streamN = row.getLong(1)
    val estimate = udf((term: String) => cms.estimateCount(term))
    tok.distinct()
      .select(col("t"), estimate(col("t")).as("est_count"), lit(streamN).as("stream_n"))
      .orderBy(col("est_count").desc, col("t").asc)
  }

  /** q67 — distinct users per event type via Datasketches HLL, plus the
    * cross-type TOTAL computed by UNIONING the per-type sketches
    * (`hll_union_agg`) — the re-aggregation exact distinct cannot do without
    * a second corpus pass, and the reason sketches (not counts) are what a
    * pipeline persists per partition/day.
    */
  def hllDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val perType = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val union = perType
      .agg(expr("hll_union_agg(sk, true)").as("sk"))
      .select(lit("__all__").as("event_type"), col("sk"))
    perType.select(col("event_type"), col("sk")).union(union)
      .select(
        col("event_type"),
        expr("cast(floor(hll_sketch_estimate(sk) + 0.5D) as bigint)").as("est_users"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_approx_quantiles" -> ((s: SparkSession, d: String) => approxQuantiles(s, d)),
    "q66_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q67_hll_distinct" -> ((s: SparkSession, d: String) => hllDistinctUsers(s, d)))

  val oracles: Map[String, String] = Map.empty
}
