package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.JoinOps

class AsOfJoinSpec extends SparkSpec {

  test("native as-of join picks the latest right row <= left ts, nulls otherwise") {
    import spark.implicits._
    val left = Seq((1L, 10L, "L1"), (1L, 3L, "L2"), (2L, 5L, "L3"))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 2L, 100L), (1L, 10L, 200L), (1L, 10L, 300L), (3L, 1L, 400L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "ts", "rid")
      .toDF("k", "ts", "lid", "rk", "rts", "rid")
    val got = out.select("lid", "rid").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // L1: ties at ts=10 break to the greatest rid (300); L2: only ts=2
    // qualifies; L3: key 2 has no right rows at all
    assert(got == Set(("L1", 300L), ("L2", 100L), ("L3", -1L)))
  }

  test("native as-of join is planned by AsOfJoinStrategy and matches the window encoding") {
    val e = graft.Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

    val native = AsOfJoinNative.asofJoin(purchases, clicks, "user_id", "ts", "click_id")
      .toDF("user_id", "ts", "purchase_id", "r_user_id", "r_ts", "click_id")
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "the custom strategy must plan the custom operator")

    val declarative = JoinOps.asofJoinOf(purchases, clicks,
      key = "user_id", tsCol = "ts", leftTie = "purchase_id", rightTie = "click_id")

    val gotNative = native.select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val gotDecl = declarative.select("purchase_id", "asof_click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(gotNative == gotDecl)
    assert(gotNative.nonEmpty)
  }
}
