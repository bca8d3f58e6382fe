package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: price the per-call cost of fixture reads and of building gate
  * DataFrames (analysis only, no execution), to size the planning tail the
  * bench pays on every rep. Prints per-call microseconds for (a) a raw
  * `spark.read.schema(s).parquet`, (b) the same through `Tables.load`'s
  * schema memo, (c) full plan construction + analysis of a few gates.
  */
object ReadCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"READCOST $label%-40s ${us}%10.1f us/call  (n=$n)")
    }
    val path = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema
    time("read.schema.parquet (unanalyzed)", 200) {
      spark.read.schema(schema).parquet(path)
    }
    time("read.schema.parquet analyzed", 200) {
      spark.read.schema(schema).parquet(path).queryExecution.analyzed
    }
    time("Tables.load analyzed", 200) {
      graft.Tables.load(spark, sfDir, "lineitem").queryExecution.analyzed
    }
    time("hadoop getFileStatus (mtime probe)", 500) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
        .getModificationTime
    }
    time("java.io.File lastModified", 500) {
      new java.io.File(path).lastModified()
    }
    time("Tables.load (no analyze getter)", 200) {
      graft.Tables.load(spark, sfDir, "lineitem")
    }
    locally {
      val cachedRel = graft.Tables.load(spark, sfDir, "lineitem")
        .queryExecution.analyzed
      time("freshRows(cachedRel)", 500) {
        org.apache.spark.sql.graft.PlanBridge.freshRows(spark, cachedRel).get
      }
      val mi = cachedRel
        .asInstanceOf[org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation]
      time("newInstance only", 500) { mi.newInstance() }
      val inst = mi.newInstance()
      time("ofRows(fresh instance)", 500) {
        org.apache.spark.sql.graft.PlanBridge.ofRows(spark, inst)
      }
    }
    locally {
      val a = graft.Tables.load(spark, sfDir, "lineitem").queryExecution.analyzed
      val b = graft.Tables.load(spark, sfDir, "lineitem").queryExecution.analyzed
      println(s"READCOST planClass=${a.getClass.getSimpleName} " +
        s"sameInstance=${a eq b} " +
        s"sameExprId=${a.output.head.exprId == b.output.head.exprId}")
      (a, b) match {
        case (x: org.apache.spark.sql.execution.datasources.LogicalRelation,
              y: org.apache.spark.sql.execution.datasources.LogicalRelation) =>
          println(s"READCOST sameBaseRelation=${x.relation eq y.relation}")
        case _ => println(s"READCOST not LogicalRelation: ${a.getClass}")
      }
    }
    val cached = spark.read.schema(schema).parquet(path).queryExecution.analyzed
    time("Dataset.ofRows(cached analyzed plan)", 200) {
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark, cached)
        .queryExecution.analyzed
    }
    // full gate construction + analysis + optimization, no execution
    Seq("q01_pricing_summary", "q02_revenue_by_nation", "q48_map_functions",
      "q89_bigram_surprisal", "q207_string_stats").foreach { q =>
      time(s"$q optimizedPlan", 20) {
        graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.optimizedPlan
      }
      time(s"$q executedPlan", 20) {
        graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      }
    }
    spark.stop()
  }
}
