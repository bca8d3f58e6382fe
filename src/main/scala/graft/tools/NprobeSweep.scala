package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Dev tool: the NPROBE AGREEMENT-VS-COST CURVE (r13, verdict order #3).
  *
  * [[Vectors.assignCellsHierarchical]]'s `nprobe` is the IVF operating
  * point: nprobe=coarseK is bitwise-exact (every fine centroid a
  * candidate), smaller values trade assignment agreement for candidate-join
  * width (the step-4 shuffle carries N×nprobe probe rows against k/coarseK
  * expected fines per coarse cell). r12's CeilingBench recorded a single
  * point (73.7% at nprobe=8 over 5-vector ceiling-k cells); this tool
  * records the whole curve at the two k regimes that matter — the natural
  * auto-k (n/64: healthy ~64-vector cells) and the ceiling k the
  * past-driver route hands the distributed path (near-ties everywhere:
  * cells of ~n/KCeiling vectors) — so the default is DERIVED from data,
  * not vibes. Agreement is measured against the flat (exact) assignment of
  * the SAME fitted centroid table; wall time is the full hierarchical
  * assignment forced through all output columns (the r12 .count() lesson).
  *
  * One JSON line per (k-regime, nprobe) point; the flat baseline is timed
  * per regime for the cost denominator. SCALING.md holds the recorded
  * table; VectorsSpec pins the derived default's agreement floor.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.NprobeSweep"
  */
object NprobeSweep {

  private def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Deterministic PLANTED-CLUSTER corpus — the SemDeDup geometry the
    * hierarchical assigner actually serves (r14, verdict order #2): tight
    * blobs of near-duplicates around well-separated centers, vs the
    * random-unit fixture where every cell boundary is a near-tie. Center
    * component (c, d) and per-vector jitter (i, d) are pure xxhash64
    * functions mapped to [-1, 1] (granularity 1e-3) — reproducible across
    * sessions and partitionings, no RNG state. Expected center separation
    * is √(2·dim/3) ≈ 6.5 at dim 64 against a noise radius of
    * `noise`·√(dim/3) ≈ 0.46 at the default 0.1 — ~14× apart, the
    * "duplicates cluster tightly" regime. Shared by the sf1 sweep and the
    * VectorsSpec clustered-floor pin so both measure the same geometry.
    */
  private[graft] def plantedClusters(
      spark: SparkSession, n: Long, centers: Int, dim: Int,
      noise: Double = 0.1): DataFrame = {
    def u(cols: Column*): Column =
      (pmod(xxhash64(cols: _*), lit(2001L)) - lit(1000L)) / lit(1000.0)
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(
        sequence(lit(0), lit(dim - 1)),
        d => (u(lit("c"), pmod(col("id"), lit(centers.toLong)) * dim + d) +
          lit(noise) * u(lit("v"), col("id") * dim + d)).cast("float"))
        .as("embedding"))
  }

  private def time(reps: Int)(body: => Long): (Seq[Double], Long) = {
    var rows = 0L
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows = body
      (System.nanoTime() - t0) / 1e9
    }
    (ts, rows)
  }

  private def fmt(ts: Seq[Double]): String =
    s"""{"samples":[${ts.map(r3).mkString(",")}],"min":${r3(ts.min)}}"""

  private def forceAssign(df: DataFrame): Long = {
    val r = df.agg(
      count(lit(1)),
      sum(col("cell")),
      sum(element_at(col("embedding"), 1).cast("double"))).collect()(0)
    r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.Bench.throttleProbe("pre", cpus.toInt)

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    val natK = Vectors.deriveKFromCount(n)
    // The clustered regime (r14): same n/dim/k as the natural regime, but
    // the corpus is planted blobs — one per fine cell on average — so the
    // recorded agreement at the derived point measures the geometry the
    // operator serves, next to the random-unit worst case.
    val regimes = Seq(
      ("natural", emb, natK),
      ("ceiling", emb, Vectors.KCeiling),
      ("clustered", plantedClusters(spark, n, natK, dim), natK))
    regimes.foreach { case (regime, corpus, k) =>
      val cents = Vectors.quantizerTable(spark, corpus, k, iterations = 1)
      val coarseK = math.max(1, math.sqrt(k.toDouble).toInt)
      val flatDf = Vectors.assignCellsWithTable(corpus, cents)
      val (flatT, _) = time(reps)(forceAssign(flatDf))
      val flat = flatDf.select(col("vec_id"), col("cell").as("cf"))
      val sweep = (Seq(1, 2, 4, 8, 16, 32, 64, 128) :+
        Vectors.deriveNprobe(coarseK) :+ coarseK)
        .distinct.sorted.filter(p => p >= 1 && p <= coarseK)
      sweep.foreach { nprobe =>
        val (t, _) = time(reps)(
          forceAssign(Vectors.assignCellsHierarchical(corpus, cents, coarseK, nprobe)))
        val hier = Vectors.assignCellsHierarchical(corpus, cents, coarseK, nprobe)
          .select(col("vec_id"), col("cell").as("ch"))
        val agree = flat.join(hier, "vec_id").filter(col("cf") === col("ch")).count()
        println(s"""{"section":"nprobe_sweep","regime":"$regime","k":$k,""" +
          s""""n":$n,"coarseK":$coarseK,"nprobe":$nprobe,""" +
          s""""derived_default":${nprobe == Vectors.deriveNprobe(coarseK)},""" +
          s""""agreement":${r3(agree.toDouble / n)},"hier":${fmt(t)},""" +
          s""""flat":${fmt(flatT)}}""")
      }
      graft.operators.Materialize.releaseAll()
    }

    graft.Bench.throttleProbe("post", cpus.toInt)
    spark.stop()
  }
}
