package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.{Index, Knn, KnnExact}

/** Dev tool: print the MEASURED recall of every spec-floored recall gate at
  * sf0.001 — the numbers behind the measured-minus-margin floors in
  * MiscSpec/LshSpec (r8 verdict: a 0.7 floor under a ~0.9 measured recall
  * would let a silent model/valve regression to 0.72 pass; record the
  * measured value and assert ≥ measured − 0.1 instead).
  */
object RecallFloors {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def meanOf(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect().map(r => (r.getLong(1), r.getLong(2)))
      val mean = rows.map(_._2).sum.toDouble / rows.map(_._1).sum
      println(f"RECALL_GATE $name mean=$mean%.3f")
    }
    meanOf("q125_lsh")(Knn.recallBenchmark(spark, sfDir))
    meanOf("q140_ivf")(Knn.recallBenchmarkIvf(spark, sfDir))
    meanOf("q158_bq")(Knn.recallBenchmarkBq(spark, sfDir))
    meanOf("q172_pq")(Knn.recallBenchmarkPq(spark, sfDir))
    meanOf("q173_sq8")(Knn.recallBenchmarkSq8(spark, sfDir))

    // LshSpec-floored search recalls
    val exact = KnnExact.topK(spark, sfDir, queryMaxId = 8, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Index.ensure(spark, sfDir)
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoPhase = setOf(Knn.lshTopKIndexed(spark, sfDir, queryMaxId = 8, k1 = 100, k2 = 10))
    println(f"RECALL_GATE two_phase mean=${(exact & twoPhase).size.toDouble / exact.size}%.3f")
    val multi = setOf(Knn.lshTopKIndexed(spark, sfDir, multiprobe = true))
    println(f"RECALL_GATE multiprobe mean=${(exact & multi).size.toDouble / exact.size}%.3f")
    val exactFiltered = KnnExact.topKFiltered(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshFiltered = setOf(Knn.lshTopKFilteredIndexed(spark, sfDir))
    println(f"RECALL_GATE filtered mean=${(exactFiltered & lshFiltered).size.toDouble / exactFiltered.size}%.3f")
    spark.stop()
  }
}
