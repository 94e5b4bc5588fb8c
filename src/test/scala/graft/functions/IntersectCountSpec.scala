package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntersectCountSpec extends SparkSpec {

  import spark.implicits._

  test("equals size(array_intersect) on every corpus shingle-set pair sharing a band") {
    val hs = graft.operators.DedupOps.shingleHashes(spark, sfDir)
    val a = hs.select(col("doc_id").as("da"), col("hs").as("ha"))
    val b = hs.select(col("doc_id").as("db"), col("hs").as("hb"))
    val mismatches = a.join(b, col("da") < col("db"))
      .filter(GraftFunctions.intersectCount(col("ha"), col("hb")) =!=
        size(array_intersect(col("ha"), col("hb"))))
      .count()
    assert(mismatches == 0L)
  }

  test("edge cases: empty, disjoint, identical, interleaved") {
    val cases = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L), 3),
      (Seq(Long.MinValue, -1L, 2L, Long.MaxValue), Seq(-1L, 0L, 2L, 3L), 2))
    cases.foreach { case (x, y, expect) =>
      val got = Seq((x, y)).toDF("a", "b")
        .select(GraftFunctions.intersectCount(col("a"), col("b")))
        .as[Int].head()
      assert(got == expect, s"$x vs $y")
    }
  }

  test("SQL registration works and rejects non-array args") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT graft_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS n")
      .as[Int].head()
    assert(n == 2)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_intersect_count('x', array(1L))").collect()
    }
  }
}
