package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Index

/** Dev probe: time the stages of the q63 posting self-join pipeline
  * separately (join fan-out vs pair aggregate vs verify/topk).
  */
object Q63Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val indexDir = Index.ensure(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n%,d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val posts = Index.postings(spark, indexDir).select(col("tbl"), col("hash"), col("vec_id"))
    time("postings scan")(posts.count())
    val joined = posts.as("a").join(posts.as("b"),
      col("a.tbl") === col("b.tbl") && col("a.hash") === col("b.hash") &&
        col("a.vec_id") < col("b.vec_id"))
    time("join fanout")(joined.count())
    val pairs = joined
      .groupBy(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .agg(count(lit(1)).as("collisions"))
    time("pair agg")(pairs.count())
    time("pair agg >=6")(pairs.filter(col("collisions") >= 6).count())
    time("full q63")(graft.operators.Vectors.lshNearDupPairs(spark, sfDir).count())
    time("full q63 again")(graft.operators.Vectors.lshNearDupPairs(spark, sfDir).count())
    spark.stop()
  }
}
