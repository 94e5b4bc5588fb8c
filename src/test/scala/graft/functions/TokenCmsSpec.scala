package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenCmsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val sketch = TextFunctions.tokenCmsOf(docs, col("text")).cache()

  private lazy val trueCounts = docs
    .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    .groupBy("tok").count().collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never undercount, and are tight for heavy hitters") {
    val toks = trueCounts.keys.toSeq.toDF("tok")
    val est = TextFunctions.cmsEstimateOf(sketch, toks, "tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = trueCounts.values.sum.toDouble
    trueCounts.foreach { case (t, c) =>
      assert(est(t) >= c, s"undercount for '$t'")
      // CMS bound: overestimate <= N * e / width w.h.p.; generous x3
      assert(est(t) - c <= 3 * math.E * n / TextFunctions.cmsWidth,
        s"loose estimate for '$t'")
    }
    // heavy hitters keep their order: top true token is top estimated
    val topTrue = trueCounts.maxBy(_._2)._1
    assert(est(topTrue) == est.values.max || trueCounts.size < 3)
  }

  test("sketches merge by summing counters") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = TextFunctions.tokenCmsOf(a, col("text"))
      .unionByName(TextFunctions.tokenCmsOf(b, col("text")))
      .groupBy("row", "bucket").agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val whole = sketch.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }
}
