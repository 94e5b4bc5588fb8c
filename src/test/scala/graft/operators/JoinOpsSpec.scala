package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {

  test("asof join: purchases match the latest prior click, or null") {
    val out = JoinOps.asofJoin(spark, sfDir)
    assert(out.count() > 0)
    // every matched click ts is <= the purchase ts
    assert(out.filter(col("last_click_ts") > col("ts")).count() == 0)
    // spot-check one user end-to-end against a driver-side replay
    val e = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val someUser = e.collect { case (u, _, _, "purchase") => u }.headOption
    someUser.foreach { u =>
      val clicks = e.filter(x => x._1 == u && x._4 == "click").sortBy(_._3.getTime)
      val purchases = e.filter(x => x._1 == u && x._4 == "purchase")
      val got = out.filter(col("user_id") === u)
        .select("purchase_id", "last_click_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      purchases.foreach { case (_, pid, pts, _) =>
        val expected = clicks.takeWhile(_._3.getTime <= pts.getTime).lastOption.map(_._2)
        assert(got(pid) == expected, s"user $u purchase $pid")
      }
    }
  }

  test("sessionize: gaps over 30min split sessions") {
    val out = JoinOps.sessionize(spark, sfDir).collect()
    assert(out.nonEmpty)
    // session bounds are ordered and session_seq starts at 1 per user
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val seqs = rows.map(_.getLong(1)).sorted
      assert(seqs.head == 1L && seqs.toSeq == (1L to seqs.length).toSeq)
    }
  }
}
