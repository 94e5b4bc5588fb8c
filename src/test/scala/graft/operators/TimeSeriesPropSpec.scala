package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized fold equivalence for the resampling spine: gap-fill and
  * LOCF over random sparse minute-level series must match a sequential
  * per-key replay — single-observation keys (1-row spine), long gaps,
  * and several events inside one hour are the spine edge cases the
  * fixture's dense event table undersamples. */
class TimeSeriesPropSpec extends SparkSpec {

  private val caseGen = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      tMin <- Gen.oneOf(Gen.choose(0L, 1800L), Gen.choose(0L, 120L))
      v <- Gen.choose(-50, 99)
    } yield (u, tMin, v / 4.0))
  } yield rows

  test("gap-fill and LOCF equal a sequential per-key replay on random series") {
    import spark.implicits._
    val prop = Prop.forAll(caseGen) { rows =>
      val ev = rows.toDF("user_id", "t_min", "value")
        .select(col("user_id"), expr("timestamp_millis(t_min * 60000)").as("ts"),
          col("value"))

      // replay: per (user, hour) exact decimal sums, then the spine
      val byHour = rows.groupBy { case (u, t, _) => (u, t / 60) }
        .map { case ((u, h), rs) =>
          (u, h) -> ((rs.length.toLong,
            rs.map(r => BigDecimal(r._3).setScale(2)).sum.toDouble))
        }
      val expectedGap = byHour.keys.groupBy(_._1).flatMap { case (u, ks) =>
        val hs = ks.map(_._2)
        (hs.min to hs.max).map { h =>
          val (n, s) = byHour.getOrElse((u, h), (0L, 0.0))
          (u, h) -> ((n, s))
        }
      }
      val expectedLocf = byHour.keys.groupBy(_._1).flatMap { case (u, ks) =>
        val hs = ks.map(_._2)
        var lastSum = 0.0
        (hs.min to hs.max).map { h =>
          byHour.get((u, h)).foreach { case (_, s) => lastSum = s }
          (u, h) -> lastSum
        }
      }

      val gotGap = TimeSeriesOps.gapFillOf(ev).collect()
        .map(r => (r.getLong(0), r.getAs[Timestamp](1).getTime / 3600000L) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val gotLocf = TimeSeriesOps.locfOf(ev).collect()
        .map(r => (r.getLong(0), r.getAs[Timestamp](1).getTime / 3600000L) ->
          r.getDouble(2)).toMap

      gotGap == expectedGap && gotLocf == expectedLocf
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
