package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: print formatted physical plans for selected gate queries so
  * join strategy / pushdown / codegen coverage can be reviewed
  * (SURVEY.md §4.2 checklist).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_revenue_by_nation", "q03_top_customers", "q23_lsh_knn", "q33_jaccard_pairs")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXEC=1: execute first and print the FINAL adaptive plan —
    // AQE stage reuse (ReusedQueryStage/ReusedExchange) only appears after
    // execution, so the pre-execution explain under-reports reuse.
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        // collect() (not count()) so THIS query execution runs — count()
        // would execute a derived plan and leave df's own stages unbuilt
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
