package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The bucketed tier's whole value is a plan property: joins and
  * aggregations on the bucket key must run with no Exchange. */
class BucketingSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("co-located join of same-bucket-count tables plans with zero exchanges") {
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    Bucketing.writeBucketed(l.repartition(4, col("l_orderkey")),
      "bspec_lineitem", "l_orderkey", numBuckets = 4)
    Bucketing.writeBucketed(o.repartition(4, col("o_orderkey")),
      "bspec_orders", "o_orderkey", numBuckets = 4)

    // disable broadcast so the planner must pick a sort-merge join —
    // the case where bucketing saves the two big exchanges
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.coLocatedJoin(spark,
        "bspec_lineitem", "bspec_orders", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and the result is the same rows a shuffled join produces
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = Bucketing.table(spark, "bspec_lineitem")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
      // same totals as the shuffled aggregation
      val viaShuffle = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
        .orderBy("l_orderkey").collect()
      assert(agg.orderBy("l_orderkey").collect().sameElements(viaShuffle))
    }
  }
}
