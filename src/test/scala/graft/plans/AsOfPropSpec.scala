package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Three-way randomized equivalence for backward as-of: the native
  * merge-join operator (LogicalPlan + Strategy + SparkPlan), the
  * declarative union+window encoding, and an in-memory brute-force
  * fold must agree row-for-row on random data — including the shapes
  * fixtures undersample: duplicate timestamps inside a key (tie broken
  * by the largest right tie id), keys present on only one side, and
  * left rows before any right row (null match). */
class AsOfPropSpec extends SparkSpec {

  private val caseGen = for {
    nl <- Gen.choose(1, 25)
    nr <- Gen.choose(0, 25)
    lrows <- Gen.listOfN(nl, for {
      k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 12L)
    } yield (k, t))
    rrows <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 12L); v <- Gen.choose(0, 99)
    } yield (k, t, v.toDouble))
  } yield (
    // (key, tsHour, leftId)
    lrows.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) },
    // (key, tsHour, rightId, value)
    rrows.zipWithIndex.map { case ((k, t, v), i) => (k, t, 1L + i, v) })

  test("native == declarative == brute force on random as-of inputs") {
    import spark.implicits._
    val hour = 3600000L
    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val left = ls.toDF("key", "tsl", "lid")
        .select(col("key"), expr("timestamp_millis(tsl * 3600000)").as("ts"), col("lid"))
      val right = rs.toDF("key", "tsr", "rid", "v")
        .select(col("key"), expr("timestamp_millis(tsr * 3600000)").as("ts"),
          col("rid"), col("v"))

      // brute force: per left row, the right row of the same key with
      // the greatest (ts <= left.ts), ties to the greatest rid
      val expected = ls.map { case (lk, lt, lid) =>
        val m = rs.filter { case (rk, rt, _, _) => rk == lk && rt <= lt }
          .sortBy { case (_, rt, rid, _) => (rt, rid) }.lastOption
        lid -> m.map { case (_, rt, rid, _) => (rid, rt) }
      }.toMap

      val native = AsOfJoinNative.asofJoin(left, right, "key", "ts", "rid")
        .toDF("key", "ts", "lid", "k2", "mts", "mrid", "mv")
        .select(col("lid"), col("mrid"), col("mts"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getAs[Timestamp](2).getTime / hour)))).toMap

      val declarative = graft.operators.JoinOps
        .asofJoinOf(left, right, "key", "ts", "lid", "rid")
        .select(col("lid"), col("asof_rid"), col("asof_ts"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getAs[Timestamp](2).getTime / hour)))).toMap

      native.keySet == expected.keySet &&
        declarative.keySet == expected.keySet &&
        expected.forall { case (lid, m) =>
          native(lid) == m && declarative(lid) == m
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
