package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: q77 executed plan + stage costs under bench settings. */
object Q77Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label rows=$n%,d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    (1 to 3).foreach { i =>
      time(s"q77 rep$i")(graft.operators.Text.shingleNearDups(spark, sfDir).count())
      graft.operators.Materialize.releaseAll()
    }
    val df = graft.operators.Text.shingleNearDups(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
