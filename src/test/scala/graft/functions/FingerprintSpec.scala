package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSpec {

  test("interpreted and codegen paths agree, and match the scalar impl") {
    import spark.implicits._
    RollingFingerprint.register(spark)
    val inputs = Seq("", "a", "ab", "hello world", "x" * 10000)
    val df = inputs.toDF("s").select(col("s"), expr("graft_fingerprint(s)").as("fp"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s => assert(got(s) == RollingFingerprint.hash(s), s"for '$s'") }
    // 'ab': (0*31+97)=97; (97*31+98)=3105 — pins the exact recurrence.
    assert(got("ab") == 3105L)
  }

  test("null in, null out") {
    import spark.implicits._
    RollingFingerprint.register(spark)
    val out = Seq[Option[String]](None, Some("x")).toDF("s")
      .selectExpr("graft_fingerprint(s) AS fp").collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("expression stays inside whole-stage codegen") {
    RollingFingerprint.register(spark)
    val df = graft.Tables.documents(spark, sfDir).selectExpr("graft_fingerprint(text)")
    val planStr = df.queryExecution.executedPlan.toString
    // whole-stage codegen stages render as "*(n) Project ..." in the plan
    assert(planStr.contains("*(1)"), planStr)
  }
}
