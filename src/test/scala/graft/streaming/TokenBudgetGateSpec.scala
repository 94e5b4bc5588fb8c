package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TokenBudgetGateSpec extends SparkSpec {

  private def corpusWithCounts() = {
    val ops = graft.operators.BpeOps
    graft.Tables.documents(spark, sfDir)
      .filter(size(filter(split(col("text"), " "), w => length(w) > 0)) >= 1)
      .withColumn("n_tokens",
        size(ops.bpeTokens(filter(split(col("text"), " "), w => length(w) > 0)))
          .cast("long"))
  }

  /** Half of each source's total token mass — the batch row's budget. */
  private def halfBudgets(): Map[String, Long] =
    corpusWithCounts().groupBy("source")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> (r.getLong(1) >> 1)).toMap

  test("one-batch feed reproduces the batch mix verdicts row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpusWithCounts()
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stream = MemoryStream[(Long, String, String)]
    stream.addData(rows.toSeq)
    val q = EventStream.tokenBudgetGateStream(
        stream.toDF().toDF("doc_id", "source", "text"), halfBudgets())
      .writeStream.format("memory").queryName("budgetgate")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("budgetgate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val batch = graft.operators.BpeOps.tokenBudgetMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(batch.nonEmpty && got == batch,
      s"stream-only ${got.diff(batch).size}, batch-only ${batch.diff(got).size}")
  }

  test("split feeds stay exactly-once on the running total") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpusWithCounts()
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // feed in the gate's own admission order so batch splits respect it
      .sortBy(t => (graft.operators.BpeOps.lehmerKey(t._1), t._1))
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[(Long, String, String)]
    val q = EventStream.tokenBudgetGateStream(
        stream.toDF().toDF("doc_id", "source", "text"), halfBudgets())
      .writeStream.format("memory").queryName("budgetgate2")
      .outputMode("append").start()
    try {
      stream.addData(first.toSeq); q.processAllAvailable()
      stream.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("budgetgate2").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // each doc exactly once
    assert(got.length == rows.length)
    assert(got.map(_._1).distinct.length == got.length)
    // and the split run equals the one-batch run because the feed order
    // already matches the per-batch admission order
    val batch = graft.operators.BpeOps.tokenBudgetMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(got.toSet == batch)
  }

  test("an unlisted source is unthrottled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    stream.addData(Seq((1L, "novel", "alpha beta gamma"), (2L, "novel", "delta")))
    val q = EventStream.tokenBudgetGateStream(
        stream.toDF().toDF("doc_id", "source", "text"), Map.empty)
      .writeStream.format("memory").queryName("budgetgate3")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("budgetgate3").collect()
    assert(got.length == 2 && got.forall(_.getBoolean(4)))
  }
}
