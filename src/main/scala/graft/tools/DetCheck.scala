package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run gate queries under two different shuffle-partition counts
  * and compare collected results — catches accumulation-order sensitivity
  * (the partitioning-independence the oracle gate depends on).
  */
object DetCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    def run(parts: String): Map[String, Seq[Seq[Any]]] = {
      val spark = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = names.map { n =>
        n -> (try SparkEntry.queries(n)(spark, sfDir).collect().map(_.toSeq).toSeq
        catch { case e: Throwable => Seq(Seq(s"ERR ${e.getMessage}")) })
      }.toMap
      spark.stop()
      out
    }
    val a = run("7")
    val b = run("32")
    var bad = 0
    names.foreach { n =>
      if (a(n) != b(n)) { bad += 1; println(s"DETCHECK MISMATCH $n") }
    }
    println(s"DETCHECK done: ${names.size} queries, $bad mismatches")
    if (bad > 0) sys.exit(1)
  }
}
