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

  test("nearest asof: distance, tolerance, and the full tie chain") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq(
      (1L, ts(100), 10L), // equidistant purchases → backward wins
      (1L, ts(200), 11L), // only a forward match in tolerance
      (1L, ts(300), 12L), // distance-0 tie on equal ts → backward side, max id
      (1L, ts(400), 13L), // nothing within tolerance → null row
      (2L, ts(500), 14L), // other key: its own series
      (1L, ts(600), 20L), // same click_id under two keys — the passes
      (2L, ts(600), 20L)  //   must re-join on (key, ts, tie), not tie
    ).toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts(90), 1L, 1.0), (1L, ts(110), 2L, 2.0),
      (1L, ts(205), 3L, 3.0),
      (1L, ts(300), 4L, 4.0), (1L, ts(300), 5L, 5.0),
      (1L, ts(480), 6L, 6.0), // 80s from click 13 — outside 50s tolerance
      (2L, ts(520), 7L, 7.0),
      (1L, ts(601), 8L, 8.0), (2L, ts(599), 9L, 9.0)
    ).toDF("user_id", "ts", "purchase_id", "value")

    val rows = JoinOps.asofNearestJoinOf(left, right, "user_id", "ts",
        "click_id", "purchase_id", toleranceUs = 50L * 1000000)
      .select("user_id", "click_id", "near_purchase_id", "direction").collect()
    assert(rows.length == left.count(), "exactly one verdict per left row")
    val out = rows.map(r => (r.getLong(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          (if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap

    assert(out((1L, 10L)) == ((Some(1L), Some("backward"))), "equal distance → earlier row")
    assert(out((1L, 11L)) == ((Some(3L), Some("forward"))))
    assert(out((1L, 12L)) == ((Some(5L), Some("backward"))), "equal-ts tie → backward max id")
    assert(out((1L, 13L)) == ((None, None)), "outside tolerance")
    assert(out((2L, 14L)) == ((Some(7L), Some("forward"))), "keys never cross")
    assert(out((1L, 20L)) == ((Some(8L), Some("forward"))), "shared tie, key 1")
    assert(out((2L, 20L)) == ((Some(9L), Some("backward"))), "shared tie, key 2")
  }

  test("nearest asof matches a brute-force reference on dense random ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // timestamps drawn from a tiny range so equal-ts and equal-distance
    // ties happen constantly
    val left = (1L to 60L).map(i => (rnd.nextInt(3).toLong, ts(rnd.nextInt(40).toLong), i))
    val right = (101L to 160L).map(i =>
      (rnd.nextInt(3).toLong, ts(rnd.nextInt(40).toLong), i, i.toDouble))
    val tolUs = 8L * 1000000

    val got = JoinOps.asofNearestJoinOf(
        left.toDF("user_id", "ts", "click_id"),
        right.toDF("user_id", "ts", "purchase_id", "value"),
        "user_id", "ts", "click_id", "purchase_id", tolUs)
      .select("click_id", "near_purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    left.foreach { case (k, lts, cid) =>
      val best = right.filter(r => r._1 == k &&
          math.abs(r._2.getTime - lts.getTime) * 1000 <= tolUs)
        .sortBy { case (_, rts, rid, _) =>
          val dist = math.abs(rts.getTime - lts.getTime)
          val tie = if (rts.getTime <= lts.getTime) -rid else rid
          (dist, rts.getTime, tie)
        }.headOption.map(_._3)
      assert(got(cid) == best, s"click $cid (key $k ts ${lts.getTime})")
    }
  }
}
