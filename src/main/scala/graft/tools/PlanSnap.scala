package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: EXECUTE every gate query (bench-mirrored session) and write
  * each one's final adaptive physical plan to `<outDir>/<query>.txt` — the
  * round's plan-evidence corpus (plans/rNN, the _before and _after files) and the
  * input to shape sweeps (join build sides, exchange counts) that grep
  * executed plans rather than pre-AQE estimates. Not part of any gate.
  *
  * Usage: sbt "runMain graft.tools.PlanSnap OUTDIR [query ...]"
  * (no query args = the full gate surface).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanSnap OUTDIR [query ...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.length > 1) args.toSeq.drop(1)
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // collect() (not count()) so THIS plan executes and carries final
        // AQE stages — the PlanDump SPARK_GRAFT_EXEC rationale.
        df.collect()
        Files.write(outDir.resolve(s"$n.txt"),
          df.queryExecution.executedPlan.toString.getBytes(StandardCharsets.UTF_8))
      } catch {
        case scala.util.control.NonFatal(e) =>
          Files.write(outDir.resolve(s"$n.ERROR.txt"),
            s"$e".getBytes(StandardCharsets.UTF_8))
      }
      graft.operators.Materialize.releaseAll()
    }
    spark.stop()
  }
}
