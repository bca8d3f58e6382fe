package graft.tools

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

    // Concurrent structures: events arrive on the listener-bus thread while
    // the main thread clears/reads between queries (after a bus drain).
    // java.lang.Long values so a missing entry is a checkable null — a
    // [Int, Long] map unboxes the miss to 0L and a cleared/racing start
    // would report a bogus epoch-sized duration.
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    // epoch for the CURRENT query's timeline offsets (r15: start/end
    // columns tell serialized jobs apart from AQE-concurrent ones — a
    // duration-only listing cannot)
    val queryEpoch = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        val now = System.nanoTime()
        val dt =
          if (t0 == null) 0.0 // start event cleared between queries
          else (now - t0.longValue()) / 1e9
        val rel =
          if (t0 == null) 0.0
          else (t0.longValue() - queryEpoch.get()) / 1e9
        jobLines.add(
          f"  job ${je.jobId}%3d  ${dt}%7.3f s  [${rel}%7.3f -> ${rel + dt}%7.3f]")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val dt = (for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s).getOrElse(0L)
        stageTimes.put(info.stageId, (info.name.take(90), dt))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Fail fast on a typo'd query name instead of a bare key-not-found
    // mid-profile.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // Warm everything once (prebuilt artifacts + codegen) so the profiled
    // run measures the same steady state the bench reports. Warm failures
    // print — a silently-cold query would be profiled as if steady-state.
    try graft.operators.Index.ensure(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) => println(s"WARM index: $e") }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) => println(s"WARM $n: $e") }
      graft.operators.Materialize.releaseAll()
    }
    names.foreach { n =>
      // Drain the async listener bus so the previous query's JobEnd/Stage
      // events can't land in (or be cleared from) this query's tables.
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      jobLines.clear(); stageTimes.clear()
      queryEpoch.set(System.nanoTime())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      graft.operators.Materialize.releaseAll()
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      println(f"=== $n  total ${total}%.3f s  jobs=${jobLines.size}")
      jobLines.forEach(l => println(l))
      import scala.jdk.CollectionConverters._
      stageTimes.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (nm, ms)) =>
        println(f"  stage $id%4d ${ms / 1000.0}%7.3f s  $nm")
      }
    }
    spark.stop()
  }
}
