package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("approx quantiles: every estimate is within the t-digest rank bound") {
    val approx = Sketches.approxQuantiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val byType = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(approx.keySet == byType.keySet)
    for ((tpe, vals) <- byType; (p, est) <- Seq(
        0.50 -> approx(tpe)._1, 0.90 -> approx(tpe)._2, 0.99 -> approx(tpe)._3)) {
      val n = vals.length
      // rank of the estimate in the exact sorted data
      val rank = vals.count(_ <= est)
      val tol = n / 1000.0 + 2 // accuracy=1000 rank guarantee (+grid slack)
      assert(math.abs(rank - p * n) <= tol,
        s"$tpe p=$p est=$est rank=$rank n=$n outside rank tolerance $tol")
    }
  }

  test("count-min heavy hitters: est >= true and est <= true + eps*N; top term right") {
    val got = Sketches.heavyHitters(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val streamN = got.head._3
    val exact = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(_._1).toSet == exact.keySet)
    got.foreach { case (t, est, _) =>
      val truth = exact(t)
      assert(est >= truth, s"CMS must never underestimate: $t est=$est true=$truth")
      assert(est <= truth + (0.001 * streamN).toLong + 1,
        s"$t est=$est true=$truth exceeds eps*N bound")
    }
    val topExact = exact.toSeq.sortBy { case (t, c) => (-c, t) }.head._1
    assert(got.head._1 == topExact, s"top heavy hitter ${got.head._1} != exact $topExact")
  }

  test("hll distinct: per-type and unioned totals within 3% of exact") {
    val got = Sketches.hllDistinctUsers(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPer = Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, sf0001)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    for ((tpe, exact) <- exactPer) {
      val est = got(tpe)
      assert(math.abs(est - exact) <= math.max(1, exact * 0.03),
        s"$tpe est=$est exact=$exact")
    }
    // The unioned sketch estimates the cross-type distinct — NOT the sum of
    // per-type counts (users appear in several types).
    val estAll = got("__all__")
    assert(math.abs(estAll - exactAll) <= math.max(1, exactAll * 0.03),
      s"union est=$estAll exact=$exactAll")
    assert(estAll < exactPer.values.sum, "union must dedup across types")
  }

  test("sketch results are partitioning-independent (mergeable state)") {
    def runHll(parts: Int): Seq[Seq[Any]] = {
      val ev = Tables.events(spark, sf0001).repartition(parts)
      ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("d"))
        .orderBy(col("event_type"))
        .collect().map(_.toSeq).toSeq
    }
    assert(runHll(2) == runHll(16))
    // CMS counters are sums — the serialized sketch itself must be
    // bit-identical under any partitioning
    def runCms(parts: Int): Seq[Byte] = {
      Tables.documents(spark, sf0001)
        .select(explode(split(col("text"), " ")).as("t"))
        .repartition(parts)
        .agg(expr("count_min_sketch(t, 0.001d, 0.99d, 42)").as("cms"))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    }
    assert(runCms(2) == runCms(16))
  }
}
