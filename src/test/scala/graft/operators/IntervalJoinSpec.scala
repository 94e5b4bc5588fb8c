package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {

  test("banded interval join equals the naive theta join, incl. bucket-spanning windows") {
    import spark.implicits._
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)
    // windows deliberately spanning bucket boundaries (bucket = 1h)
    val windows = Seq(
      (10L, ts(50), ts(110)),  // crosses the hour boundary
      (20L, ts(0), ts(59)),    // exactly one bucket
      (30L, ts(200), ts(380))) // spans 4 buckets
      .toDF("w_id", "w_start", "w_end")
    val points = (0L to 400L by 7).map(m => (m, ts(m))).toDF("p_id", "p_ts")

    val banded = JoinOps.bandedIntervalJoinOf(points, windows,
        "p_ts", "w_start", "w_end", bucketWidthUs = 3600L * 1000000)
      .select("p_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(windows,
        col("p_ts") >= col("w_start") && col("p_ts") <= col("w_end"))
      .select("p_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(naive.nonEmpty)
    // no duplicate pairs from a window spanning several buckets
    val bandedRows = JoinOps.bandedIntervalJoinOf(points, windows,
      "p_ts", "w_start", "w_end", bucketWidthUs = 3600L * 1000000).count()
    assert(bandedRows == naive.size.toLong)
  }
}
