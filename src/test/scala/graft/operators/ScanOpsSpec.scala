package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScanOpsSpec extends SparkSpec {
  import ScanFilter._

  private def df = {
    import spark.implicits._
    Seq(
      ("oqmd_v1.1", Some(10), "alpha"),
      ("oqmd_v1.2", Some(20), "beta"),
      ("jcap_v2.1", None, "gamma"),
      ("xy", Some(5), "al"))
      .toDF("source_id", "score", "tag")
      .withColumn("score", col("score"))
  }

  test("operator string form parses like the reference") {
    assert(ScanFilter("f", "^", "x") == BeginsWith("f", "x"))
    assert(ScanFilter("f", "*", "x") == Contains("f", "x"))
    assert(ScanFilter("f", "==", null) == Eq("f", None))
    assert(ScanFilter("f", "!=", null) == Ne("f", None))
    assert(ScanFilter("f", "[]", Seq(1, 2)) == Between("f", 1, 2))
    assert(ScanFilter("f", "in", Seq(1, 2)) == In("f", Seq(1, 2)))
    assertThrows[IllegalArgumentException](ScanFilter("f", "~", 1))
    assertThrows[IllegalArgumentException](ScanFilter("f", "[]", Seq(1)))
  }

  test("begins-with and contains") {
    assert(ScanOps.scan(df, filters = Seq(BeginsWith("source_id", "oqmd"))).count() == 2)
    assert(ScanOps.scan(df, filters = Seq(Contains("tag", "al"))).count() == 2)
  }

  test("null-existence semantics: ==None is not-exists, !=None is exists") {
    assert(ScanOps.scan(df, filters = Seq(Eq("score", None))).count() == 1)
    assert(ScanOps.scan(df, filters = Seq(Ne("score", None))).count() == 3)
  }

  test("conjunction + projection") {
    val out = ScanOps.scan(df,
      fields = Seq("source_id"),
      filters = Seq(Between("score", 5, 15), In("tag", Seq("alpha", "al"))))
    assert(out.columns.toSeq == Seq("source_id"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("oqmd_v1.1", "xy"))
  }

  test("filters reach the parquet scan (pushdown)") {
    val plan = ScanOps.scan(
      graft.Tables.lineitem(spark, sfDir),
      fields = Seq("l_orderkey", "l_quantity"),
      filters = Seq(ScanFilter("l_quantity", ">", 45.0)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"))
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"))
  }
}
