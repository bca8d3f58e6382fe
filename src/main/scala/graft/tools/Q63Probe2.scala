package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Lsh, Vectors}

/** Dev probe for the inline-hash q63 pipeline: stage-by-stage wall times. */
object Q63Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n%,d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // mirror lshNearDupPairs' DEFAULTS (tables/minCollisions) so the stage
    // breakdown decomposes the same pipeline "full q63" times
    val tables = 16
    val minCollisions = 3
    val n = Tables.embeddingsCount(spark, sfDir)
    val bits = Lsh.deriveBits(n, Lsh.PairTargetBucket)
    println(s"PROBE n=$n bits=$bits tables=$tables")
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val t0 = System.nanoTime()
    val model = Lsh.fit(emb, tables, bits)
    println(f"PROBE fit t=${(System.nanoTime() - t0) / 1e9}%.2f")
    val posts = Lsh.explodeHashes(Lsh.withHashes(spark, emb, model))
    time("hash+explode")(posts.count())
    val joined = posts.as("a").join(posts.as("b"),
      col("a.tbl") === col("b.tbl") && col("a.hash") === col("b.hash") &&
        col("a.vec_id") < col("b.vec_id"))
    time("join fanout")(joined.count())
    val pairs = joined
      .groupBy(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .agg(count(lit(1)).as("collisions"))
      .filter(col("collisions") >= minCollisions)
    time("pair agg >=6")(pairs.count())
    time("full q63")(Vectors.lshNearDupPairs(spark, sfDir).count())
    time("full q63 again")(Vectors.lshNearDupPairs(spark, sfDir).count())
    spark.stop()
  }
}
