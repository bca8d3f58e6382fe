package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join (SURVEY.md §4.2 partitioning row): writing
  * both join sides bucketed by the join key lets Catalyst drop the shuffle
  * Exchanges entirely — on a 100 TB lineitem⋈orders this is the difference
  * between a full-network shuffle and a local zip of bucket files.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without shuffle exchanges") {
    // force a shuffle-based join so the bucketing effect is observable
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
  }

  private def bucketedJoinBody(): Unit = {
    val ord = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")
    ord.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    cust.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join:\n$plan")
    // with matching bucketing there must be no Exchange feeding the join
    val joinIdx = math.max(plan.indexOf("SortMergeJoin"), plan.indexOf("ShuffledHashJoin"))
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and the result matches the unbucketed join
    val expect = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }
}
