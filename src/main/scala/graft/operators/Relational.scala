package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational ✪ operator queries (SURVEY.md §2.B) over the TPC-H-ish star
  * schema. Each query is declared with the DataFrame API so Catalyst handles
  * pushdown, pruning, and join selection; every query has a matching DuckDB
  * oracle in `oracles`.
  */
object Relational {

  /** q01 — hash aggregate, partial+final: pricing summary by flag/status.
    * Exercises groupBy + sum/avg/count with exact (order-independent)
    * arithmetic. At scale: pure map-side partial agg + tiny shuffle (6 groups).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Det.exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
        Det.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Det.exactAvg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummaryOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       sum(l_quantity) AS sum_qty,
       |       ${Det.sqlExactSum("l_extendedprice", 2)} AS sum_base_price,
       |       ${Det.sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |       ${Det.sqlExactAvg("l_discount", 4)} AS avg_disc,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
