package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized brute-force equivalence for the remaining as-of shapes
  * (backward has its own three-way spec): FORWARD picks the earliest
  * right at-or-after, ties to the SMALLEST right id; NEAREST composes
  * both directions under a tolerance with backward winning distance
  * ties. Random duplicate timestamps, one-sided keys, and
  * out-of-tolerance rows are exactly the shapes the fixtures
  * undersample. */
class AsOfVariantsPropSpec extends SparkSpec {

  private val hourUs = 3600000000L

  private val caseGen = for {
    nl <- Gen.choose(1, 20)
    nr <- Gen.choose(0, 20)
    lrows <- Gen.listOfN(nl, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
    } yield (k, t))
    rrows <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
    } yield (k, t))
  } yield (
    lrows.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) },
    rrows.zipWithIndex.map { case ((k, t), i) => (k, t, 1L + i, (t * 2).toDouble) })

  private def frames(ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    val left = ls.toDF("key", "tsl", "lid")
      .select(col("key"), expr("timestamp_millis(tsl * 3600000)").as("ts"), col("lid"))
    val right = rs.toDF("key", "tsr", "rid", "v")
      .select(col("key"), expr("timestamp_millis(tsr * 3600000)").as("ts"),
        col("rid"), col("v"))
    (left, right)
  }

  test("forward as-of equals the brute-force earliest-at-or-after fold") {
    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val (left, right) = frames(ls, rs)
      val expected = ls.map { case (lk, lt, lid) =>
        val m = rs.filter { case (rk, rt, _, _) => rk == lk && rt >= lt }
          .sortBy { case (_, rt, rid, _) => (rt, rid) }.headOption
        lid -> m.map { case (_, rt, rid, _) => (rid, rt) }
      }.toMap
      val got = JoinOps.asofForwardJoinOf(left, right, "key", "ts", "lid", "rid")
        .select(col("lid"), col("asof_rid"), col("asof_ts"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getAs[Timestamp](2).getTime / 3600000L)))).toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("nearest as-of equals the brute-force two-direction fold under tolerance") {
    val tolUs = 3L * hourUs
    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val (left, right) = frames(ls, rs)
      val expected = ls.map { case (lk, lt, lid) =>
        val back = rs.filter { case (rk, rt, _, _) => rk == lk && rt <= lt }
          .sortBy { case (_, rt, rid, _) => (rt, rid) }.lastOption
        val fwd = rs.filter { case (rk, rt, _, _) => rk == lk && rt >= lt }
          .sortBy { case (_, rt, rid, _) => (rt, rid) }.headOption
        val db = back.map { case (_, rt, _, _) => (lt - rt) * hourUs }
        val df = fwd.map { case (_, rt, _, _) => (rt - lt) * hourUs }
        val bOk = db.exists(_ <= tolUs)
        val fOk = df.exists(_ <= tolUs)
        val useB = bOk && (!fOk || db.get <= df.get)
        val m =
          if (useB) back.map { case (_, rt, rid, _) => (rid, rt, "backward") }
          else if (fOk) fwd.map { case (_, rt, rid, _) => (rid, rt, "forward") }
          else None
        lid -> m
      }.toMap
      val got = JoinOps
        .asofNearestJoinOf(left, right, "key", "ts", "lid", "rid", tolUs)
        .select(col("lid"), col("near_rid"), col("near_ts"), col("direction"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getAs[Timestamp](2).getTime / 3600000L,
            r.getString(3))))).toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
