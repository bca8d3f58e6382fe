package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: cumulative Catalyst rule timing over the whole gate surface.
  *
  * Runs every gate query once on a canonical session and prints
  * `RuleExecutor.dumpTimeSpent()` — the analyzer/optimizer rules ranked by
  * total time — to locate planning-time hotspots that are worth excluding
  * (the measurement behind the constraint-propagation default; see
  * Bench.scala). Pass query names to restrict the surface.
  */
object RuleTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Canonical flag — see Bench.scala. Flip via the env hook below to
      // re-measure what the propagation rules cost.
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CONSTRAINT_PROP", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Warm pass so artifact builds/model fits don't pollute the rule log,
    // then reset and measure only steady-state planning.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERR $n ${e.getClass.getSimpleName}") }
      graft.operators.Materialize.releaseAll()
    }
    println(f"MEASURED_PASS_SEC ${(System.nanoTime() - t0) / 1e9}%.2f")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
