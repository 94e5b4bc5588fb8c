package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofGenericSpec extends SparkSpec {

  test("generic asof join matches the query-shaped implementation") {
    val e = graft.Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"), col("value"))

    val generic = JoinOps.asofJoinOf(purchases, clicks,
        key = "user_id", tsCol = "ts", leftTie = "purchase_id", rightTie = "click_id")
      .select(col("purchase_id"), col("asof_click_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val reference = JoinOps.asofJoin(spark, sfDir)
      .select(col("purchase_id"), col("last_click_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(generic == reference)
  }
}
