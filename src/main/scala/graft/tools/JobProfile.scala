package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run one gate query and print its per-job / per-stage wall-time
  * breakdown, to tell scheduling overhead (many tiny jobs) apart from real
  * work (one heavy stage) when chasing bench outliers. Not part of any gate.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q23_lsh_knn")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobStart = mutable.Map[Int, Long]()
    val jobLines = mutable.ArrayBuffer[String]()
    val stageTimes = mutable.Map[Int, (String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - jobStart.getOrElse(je.jobId, System.nanoTime())) / 1e9
        jobLines += f"  job ${je.jobId}%3d  ${dt}%7.3f s"
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val dt = (for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s).getOrElse(0L)
        stageTimes(info.stageId) = (info.name.take(90), dt)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Warm everything once (prebuilt artifacts + codegen) so the profiled
    // run measures the same steady state the bench reports.
    try graft.operators.Index.ensure(spark, sfDir) catch { case _: Throwable => () }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => () }
      graft.operators.Materialize.releaseAll()
    }
    names.foreach { n =>
      jobLines.clear(); stageTimes.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      graft.operators.Materialize.releaseAll()
      println(f"=== $n  total ${total}%.3f s  jobs=${jobLines.size}")
      jobLines.foreach(println)
      stageTimes.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (nm, ms)) =>
        println(f"  stage $id%4d ${ms / 1000.0}%7.3f s  $nm")
      }
    }
    spark.stop()
  }
}
