package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorSumAggSpec extends SparkSpec {

  test("vecsum equals the posexplode + sum reassembly, per group") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0, 2.0, 3.0)),
      (1, Seq(10.0, 20.0, 30.0)),
      (2, Seq(0.5, -0.5, 1.5)),
      (2, Seq(0.0, 0.0, 0.0)),
      (3, Seq(7.0, 8.0, 9.0)))
      .toDF("g", "v")

    val native = df.groupBy(col("g"))
      .agg(GraftFunctions.vecsum(col("v")).as("sv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap

    val declarative = df
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        e => e.getField("s")).as("sv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap

    assert(native == declarative)
  }

  test("vecsum ignores null vectors and returns null for all-null groups") {
    import spark.implicits._
    val df = Seq(
      (1, Option(Seq(1.0, 1.0))),
      (1, None),
      (2, None))
      .toDF("g", "v")
    val got = df.groupBy(col("g")).agg(GraftFunctions.vecsum(col("v")).as("sv"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1).toSeq))
      .toMap
    assert(got(1) == Seq(1.0, 1.0))
    assert(got(2) == null)
  }
}
