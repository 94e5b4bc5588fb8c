package graft.operators

import graft.SparkSpec

class DauWauSpec extends SparkSpec {

  private lazy val rows = AnalyticsOps.dauWau(spark, sfDir).collect()

  test("WAU is the trailing-7-day distinct-user count, checked by brute force") {
    val byDay = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "to_date(ts) AS day")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val dau = byDay.filter(_._2 == d).map(_._1).distinct.length
      val wau = byDay.filter { case (_, a) =>
        !a.isAfter(d) && !a.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length
      assert(r.getLong(1) == dau, s"$d dau")
      assert(r.getLong(2) == wau, s"$d wau")
      assert(math.abs(r.getDouble(3) - dau.toDouble / wau) < 1e-6)
    }
  }

  test("warm-up days with a partial lookback are trimmed; the rest are dense-covered") {
    val first = graft.Tables.events(spark, sfDir)
      .selectExpr("min(to_date(ts))").collect()(0).getDate(0).toLocalDate
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(!d.isBefore(first.plusDays(6)), s"partial-lookback day $d reported")
      assert(r.getLong(2) >= r.getLong(1), s"$d WAU < DAU")
    }
  }
}
