package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The time-series story at 100 TB: an event stream persisted bucketed
  * by user_id satisfies the per-user window's ClusteredDistribution
  * straight from the table layout, so per-key window operators (EWMA,
  * running aggregations, sessionization) run with NO shuffle exchange —
  * the scan feeds the window sort directly.
  */
class BucketedWindowSpec extends SparkSpec {

  test("per-user window over a user-bucketed table runs without a shuffle exchange") {
    try {
      graft.Tables.events(spark, sfDir)
        .write.mode("overwrite").bucketBy(4, "user_id")
        .sortBy("user_id", "ts").saveAsTable("events_bucketed")

      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val smoothed = spark.table("events_bucketed")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          avg(col("value")).over(w.rowsBetween(-7, 0)).as("trail_avg"))

      val plan = smoothed.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucket layout must satisfy the window's distribution:\n" + plan)

      // and values match the same window over the plain parquet table
      val expected = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          avg(col("value")).over(w.rowsBetween(-7, 0)).as("trail_avg"))
        .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
      val got = smoothed.collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_bucketed")
    }
  }
}
