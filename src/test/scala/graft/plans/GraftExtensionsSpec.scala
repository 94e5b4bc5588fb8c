package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("HOF dot product is rewritten to the native expression, same result") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite

    try {
      // parquet-backed input so constant folding can't pre-evaluate
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val hof = e.select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("dot"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        hof.queryExecution.optimizedPlan.toString)
      val native = e.select(col("vec_id"),
        graft.functions.GraftFunctions.dot(col("v"), col("v")).as("dot"))
      assert(hof.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ==
        native.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("rewrite leaves non-dot aggregates alone") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      // sum (not product) inside zip_with: must not be rewritten
      val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
          lit(0.0), (acc, v) => acc + v).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.collect()(0).getDouble(0) == 10.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("extensions entry point applies cleanly") {
    // buildOptimizerRules is private[sql]; injection not throwing plus the
    // rewrite tests above cover the rule's behavior
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
