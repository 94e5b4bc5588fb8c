package graft.operators

import graft.SparkSpec

class EventTransitionsSpec extends SparkSpec {

  test("transition matrix: rows sum to their from-total, ppm within floor slack") {
    val rows = AnalyticsOps.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per from-type: transition counts are consistent and conditional
    // ppm sums to 1e6 within one floor-division unit per destination
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val total = ts.map(_._3).sum
      ts.foreach { case (_, _, n, ppm) =>
        assert(ppm === n * 1000000L / total, s"$from ppm mismatch")
      }
      val ppmSum = ts.map(_._4).sum
      assert(ppmSum <= 1000000L && ppmSum > 1000000L - ts.length,
        s"$from ppm sum $ppmSum out of floor-slack band")
    }
    // matrix is over the real event-type alphabet, both directions
    val types = rows.map(_._1).toSet ++ rows.map(_._2).toSet
    assert(types.size >= 3, "degenerate alphabet")
  }

  test("transitions count every non-first event exactly once") {
    val rows = AnalyticsOps.eventTransitions(spark, sfDir).collect()
    val nTrans = rows.map(_.getLong(2)).sum
    val ev = graft.Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nTrans === expected, "each user contributes |events|-1 transitions")
  }
}
