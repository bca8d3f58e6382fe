package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, SubqueryAlias}

/** Dev tool: enumerate gate queries whose FINAL operator is a global sort
  * NOT protected by a limit — the set whose per-query bench timing
  * under-prices the terminal sort: Bench's rep action is `.count()`, and
  * Catalyst's `EliminateSorts` removes an order-irrelevant final sort under
  * the count aggregate. Sort+limit queries are unaffected (the limit keeps
  * the sort: TakeOrderedAndProject). Feeds the BASELINE.md methodology
  * disclosure; pure plan inspection, no execution.
  */
object SortElision {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val affected = names.flatMap { case (name, fn) =>
      // terminal = a root-level chain of Project/SubqueryAlias ending at a
      // global Sort; any Limit above the Sort makes it the root instead
      // (GlobalLimit(…, Sort)) and the sort survives count()
      def terminalUnlimitedSort(p: LogicalPlan): Boolean = p match {
        case Project(_, child) => terminalUnlimitedSort(child)
        case SubqueryAlias(_, child) => terminalUnlimitedSort(child)
        case s: Sort => s.global
        case _ => false
      }
      val hit =
        try terminalUnlimitedSort(fn(spark, sfDir).queryExecution.analyzed)
        catch { case _: Throwable => false }
      graft.operators.Materialize.releaseAll()
      if (hit) Some(name) else None
    }
    println(s"terminal no-limit global sorts (${affected.size} of ${names.size}): " +
      affected.mkString(", "))
    spark.stop()
  }
}
