package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.{KnnExact, Vectors}
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val exact = KnnExact.topK(spark, sf, 8, 10).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Vectors.annIvf(spark, sf, 8, 10).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"RECALL ivf-refined: ${(exact & ivf).size.toDouble / exact.size}%.3f")
    spark.stop()
  }
}
