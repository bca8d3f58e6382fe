package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Dev tool: per-stage wall times of the distributed Lloyd fit
  * ([[graft.operators.Vectors.refineCentroidsTable]]) — written to explain
  * the 546 s `quantizerTable` fit CeilingBench measured at k=16384 over
  * 200 k replicated sf1 vectors (r12). Times each stage of one iteration
  * in isolation: seed build, assignment, the (cell, dim) sum aggregate,
  * centroid rebuild, and the pinned checkpoint.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_FIT_K=16384 \
  *   sbt "runMain graft.tools.FitProfile"
  */
object FitProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_FIT_K", "16384").toInt
    val scaleF = sys.env.getOrElse("SPARK_GRAFT_CEILING_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val emb = (0 until math.max(1, scaleF)).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionAll _)
    emb.count() // scan warm

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"FITPROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%9.3f s  (rows=$n)")
    }

    t("seed_build")(Vectors.seedCentroidsTable(emb, k).count())
    val seed = Vectors.seedCentroidsTable(emb, k)
    val pinned = graft.operators.Materialize.stable(seed, eager = true)
    t("seed_pin_eager")(pinned.count())
    t("assign")(Vectors.assignCellsWithTable(emb, pinned).count())
    val Scale = 1000000L
    val sums = Vectors.assignCellsWithTable(emb, pinned)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(graft.operators.Det.quant(col("v").cast("double") * Scale, 0)).as("s"),
        count(lit(1)).as("n"))
    t("assign+sums")(sums.count())
    val refined = sums
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"),
        (col("s").cast("double") / Scale / col("n")).cast("float").as("x")))).as("pairs"))
      .select(col("cell"), expr("transform(pairs, p -> p.x)").as("centroid"))
    t("assign+sums+rebuild")(refined.count())
    val next = pinned.as("p")
      .join(refined.as("r"), col("p.cell") === col("r.cell"), "left")
      .select(col("p.cell").as("cell"),
        coalesce(col("r.centroid"), col("p.centroid")).as("centroid"))
    t("full_iteration")(next.count())
    t("full_iteration_pinned") {
      val p2 = graft.operators.Materialize.stable(next, eager = true)
      val n = p2.count()
      graft.operators.Materialize.release(p2)
      n
    }
    graft.operators.Materialize.release(pinned)
    t("refineCentroidsTable_1iter") {
      val r = Vectors.refineCentroidsTable(spark, emb,
        Vectors.seedCentroidsTable(emb, k), 1)
      val n = r.count()
      graft.operators.Materialize.release(r)
      n
    }
    spark.stop()
  }
}
