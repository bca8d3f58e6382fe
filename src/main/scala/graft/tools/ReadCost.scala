package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: price the per-call cost of fixture reads and of building gate
  * DataFrames (analysis only, no execution), to size the planning tail the
  * bench pays on every rep — the measurement behind the resolved-relation
  * memo in [[graft.Readers]] (a fresh `spark.read` costs ~6-9 ms of
  * datasource resolution; a `newInstance()` copy of a memoized relation
  * ~25 us, plus Spark's ~0.9 ms analyzer floor for any fresh plan).
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
    time("fresh read.schema.parquet", 200) {
      spark.read.schema(schema).parquet(path)
    }
    time("Tables.load (memoized relation)", 200) {
      graft.Tables.load(spark, sfDir, "lineitem")
    }
    time("hadoop getFileStatus (mtime probe)", 500) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
        .getModificationTime
    }
    locally {
      val cachedRel = graft.Tables.load(spark, sfDir, "lineitem")
        .queryExecution.analyzed
      val mi = cachedRel
        .asInstanceOf[org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation]
      time("newInstance only", 500) { mi.newInstance() }
      time("ofRows(fresh instance) [analyzer floor]", 500) {
        org.apache.spark.sql.graft.PlanBridge.freshRows(spark, cachedRel).get
      }
      // the contract the ReadersSpec regression test locks
      val a = graft.Tables.load(spark, sfDir, "lineitem").queryExecution.analyzed
      val b = graft.Tables.load(spark, sfDir, "lineitem").queryExecution.analyzed
      println(s"READCOST sameInstance=${a eq b} " +
        s"sameExprId=${a.output.head.exprId == b.output.head.exprId}")
    }
    // mutable-layout read path: the per-call staleness key (r10: child-
    // listing signature) vs the plain dir stat it replaced, and the full
    // Readers.parquet call on a store layout
    locally {
      val store = graft.operators.Retrieval.ensureVocabStore(spark, sfDir)
      val postings = graft.operators.Index.ensure(spark, sfDir) + "/postings"
      def sig(path: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val st = fs.getFileStatus(p)
        if (st.isDirectory) fs.listStatus(p).foreach(s => { s.getLen; s.getModificationTime })
      }
      time("childSig listStatus (vocab store dir)", 500) { sig(store) }
      time("childSig listStatus (postings, 64 dirs)", 500) { sig(postings) }
      time("Readers.parquet (vocab store)", 200) {
        graft.Readers.parquet(spark, store)
      }
    }
    // full gate construction + optimization + physical planning, no execution
    Seq("q01_pricing_summary", "q02_revenue_by_nation", "q48_map_functions",
      "q89_bigram_surprisal", "q207_string_stats").foreach { q =>
      time(s"$q executedPlan", 20) {
        graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      }
    }
    spark.stop()
  }
}
