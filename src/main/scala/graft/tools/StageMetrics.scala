package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run gate queries (bench-mirrored session) and print PER-STAGE
  * task metrics — task count, summed executor run/CPU time, scheduler-side
  * latency (launch overhead), shuffle bytes, spill — so a dominant stage
  * from [[JobProfile]] can be attributed to scheduling vs compute vs
  * exchange without the (disabled) UI. Not part of any gate.
  */
object StageMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q23_lsh_knn")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Plans.enableInstanceReuse()

    // (stageId -> (nTasks, runMs, cpuNs, gcMs, shufReadB, shufWriteB, resultSerMs, deserMs))
    case class Acc(var n: Int = 0, var runMs: Long = 0, var cpuNs: Long = 0,
        var gcMs: Long = 0, var srB: Long = 0, var swB: Long = 0,
        var serMs: Long = 0, var deserMs: Long = 0, var inB: Long = 0)
    val acc = new java.util.concurrent.ConcurrentHashMap[Int, Acc]()
    val wall = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = acc.computeIfAbsent(te.stageId, _ => Acc())
          a.synchronized {
            a.n += 1
            a.runMs += m.executorRunTime
            a.cpuNs += m.executorCpuTime
            a.gcMs += m.jvmGCTime
            a.srB += m.shuffleReadMetrics.totalBytesRead
            a.swB += m.shuffleWriteMetrics.bytesWritten
            a.serMs += m.resultSerializationTime
            a.deserMs += m.executorDeserializeTime
            a.inB += m.inputMetrics.bytesRead
          }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dt = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(0L)
        wall.put(i.stageId, dt)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    try graft.operators.Index.ensure(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) => println(s"WARM index: $e") }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) => println(s"WARM $n: $e") }
      graft.operators.Materialize.releaseAll()
    }
    names.foreach { n =>
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      acc.clear(); wall.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      graft.operators.Materialize.releaseAll()
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val rows = acc.asScala.toSeq.sortBy(-_._2.runMs)
      val sumRun = rows.map(_._2.runMs).sum
      val sumTasks = rows.map(_._2.n).sum
      println(f"=== $n  total ${total}%.3f s  stages=${rows.size} tasks=$sumTasks sumRunMs=$sumRun")
      rows.take(14).foreach { case (id, a) =>
        val w = wall.getOrDefault(id, 0L)
        println(f"  stage $id%4d wall=${w}%5d ms tasks=${a.n}%3d run=${a.runMs}%5d cpu=${a.cpuNs / 1000000}%5d gc=${a.gcMs}%3d deser=${a.deserMs}%4d ser=${a.serMs}%3d in=${a.inB / 1024}%6d KB sr=${a.srB}%8d B sw=${a.swB}%8d B")
      }
    }
    spark.stop()
  }
}
