package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeriesOps

class AnomalyStreamSpec extends SparkSpec {

  test("streaming anomaly scores match the batch operator (1e-9) with identical flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.events(spark, sfDir).select("event_type", "ts")
    val rows = events.as[(String, Timestamp)].collect().toSeq
    val maxTs = rows.map(_._2.getTime).max

    val stream = MemoryStream[(String, Timestamp)]
    stream.addData(rows)
    val q = EventStream.anomalyScoreStream(stream.toDF().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // real hour (+watermark delay +26h headroom), the second triggers
      // the event-time timeouts that finalize the tail
      stream.addData(Seq(("__sentinel__", new Timestamp(maxTs + 30L * 3600000))))
      q.processAllAvailable()
      stream.addData(Seq(("__sentinel__", new Timestamp(maxTs + 31L * 3600000))))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("anomaly_stream")
      .filter(col("event_type") =!= "__sentinel__").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("bucket").getTime) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("zscore"), r.getAs[Boolean]("anomaly"))))
      .toMap
    val batch = TimeSeriesOps.anomalyOf(events).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("bucket").getTime) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("zscore"), r.getAs[Boolean]("anomaly"))))
      .toMap

    assert(batch.nonEmpty && streamed.keySet == batch.keySet,
      s"spine mismatch: stream ${streamed.size} rows vs batch ${batch.size}")
    streamed.foreach { case (k, (n, z, flag)) =>
      val (bn, bz, bflag) = batch(k)
      assert(n == bn, s"$k count")
      assert(math.abs(z - bz) < 1e-9, s"$k zscore $z vs $bz")
      assert(flag == bflag, s"$k flag")
    }
  }

  test("no hour is emitted before the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Long) = new Timestamp(1700000000000L / 3600000 * 3600000 + h * 3600000)
    val stream = MemoryStream[(String, Timestamp)]
    // 20 hourly events, watermark (1h delay) cannot have passed the tail
    stream.addData((0L until 20L).map(h => ("a", ts(h))))
    val q = EventStream.anomalyScoreStream(stream.toDF().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("anomaly_wm")
      .outputMode("append").start()
    try { q.processAllAvailable(); stream.addData(Seq(("a", ts(20)))); q.processAllAvailable() }
    finally q.stop()
    val emitted = spark.table("anomaly_wm").collect()
      .map(_.getAs[Timestamp]("bucket").getTime)
    // watermark after batch 1 = ts(19) - 1h = ts(18); final hours end <= ts(18)
    assert(emitted.nonEmpty && emitted.max <= ts(17).getTime,
      "hours at/above the watermark must stay pending")
  }
}
