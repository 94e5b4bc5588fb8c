package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The bounded top-k aggregate must be value-identical to the
  * declarative `slice(array_sort(collect_set(struct(score, id))), 1, k)`
  * chain (and its `reverse` twin for descending) — including NaN
  * (sorts above everything), -0.0 (normalized to 0.0 like UnsafeRow,
  * so it collapses with a 0.0 duplicate), exact duplicates (collapse
  * once), and any partitioning (mergeable summaries). This equivalence is what lets the streaming ANN probes
  * swap the all-candidates buffer for O(k) state without changing one
  * output row. */
class TopKAggSpec extends SparkSpec {

  private val k = 5

  // -0.0 is exercised by the dedicated test below: SQL comparison
  // semantics treat it as equal to 0.0 while collect_set's java
  // equality does not, so the declarative chain is not ground truth
  // for that one value.
  private val scoreGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-2.0, 2.0),
    Gen.oneOf(0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.5, 1.5)) // repeated literal → forced dups

  private val rowGen: Gen[(Long, Double, Long)] = for {
    g <- Gen.choose(0L, 2L)
    s <- scoreGen
    i <- Gen.choose(0L, 6L) // small id range → forced exact duplicates
  } yield (g, s, i)

  test("agg == declarative sort/slice chain on adversarial inputs, both directions") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("g", "score", "id").repartition(3).cache()
      try {
        Seq(true, false).forall { asc =>
          val got = df.groupBy("g")
            .agg(GraftFunctions.topkScoreId(col("score"), col("id"), k, asc).as("top"))
            .collect().map(r => r.getLong(0) ->
              r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))).toMap
          val sorted = array_sort(collect_set(struct(col("score"), col("id"))))
          val chain = if (asc) sorted else reverse(sorted)
          val want = df.groupBy("g")
            .agg(slice(chain, 1, k).as("top"))
            .collect().map(r => r.getLong(0) ->
              r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))).toMap
          got.keySet == want.keySet && got.keySet.forall { g =>
            got(g).zip(want(g)).forall { case ((s1, i1), (s2, i2)) =>
              java.lang.Double.compare(s1, s2) == 0 && i1 == i2
            } && got(g).length == want(g).length
          }
        }
      } finally df.unpersist()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("-0.0 normalizes to 0.0 and collapses with a 0.0 duplicate") {
    import spark.implicits._
    val got = Seq((0L, -0.0, 1L), (0L, 0.0, 1L), (0L, -0.0, 2L))
      .toDF("g", "score", "id").groupBy("g")
      .agg(GraftFunctions.topkScoreId(col("score"), col("id"), k, ascending = true).as("top"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(got == Seq((0.0, 1L), (0.0, 2L)))
    assert(got.forall(t => !(t._1 equals -0.0))) // stored value is +0.0
  }

  test("output is invariant under input partitioning") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (i % 7L, (i * 37 % 100) / 10.0, i.toLong))
    def run(parts: Int) = rows.toDF("g", "score", "id").repartition(parts)
      .groupBy("g")
      .agg(GraftFunctions.topkScoreId(col("score"), col("id"), k, ascending = true).as("top"))
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }
}
