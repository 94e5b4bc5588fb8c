package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing is the co-located-join story at 100 TB: both fact tables
  * written bucketed by the join key join without any shuffle exchange.
  * This spec proves the plan shape on real bucketed tables.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, sfDir)
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      graft.Tables.lineitem(spark, sfDir)
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")

      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(plan.contains("SortMergeJoin"), plan)
      // no exchange below the join: bucket layout provides the partitioning
      assert(!joinSection.contains("Exchange hashpartitioning"), plan)

      // and the result matches the unbucketed join
      val expected = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        expected.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
