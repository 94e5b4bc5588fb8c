package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  test("a duplicated >=W-token span is cut from every occurrence, order preserved") {
    // "p q r s" (W=4) duplicated across docs 1 and 2; everything else unique
    val docs = Seq(
      (1L, "a b c p q r s d e"),
      (2L, "f g p q r s h"),
      (3L, "u v w x y z")
    ).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(out(1L) == ((9L, 4L, "a b c d e")))
    assert(out(2L) == ((7L, 4L, "f g h")))
    assert(out(3L) == ((6L, 0L, "u v w x y z")))
  }

  test("a span longer than W is covered end-to-end by its run of W-windows") {
    // 6-token duplicated span with W=4: windows at offsets 0,1,2 of the
    // span chain across it, so all 6 tokens go, not just the first 4
    val docs = Seq(
      (1L, "x1 p q r s t u x2"),
      (2L, "y1 y2 p q r s t u")
    ).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((6L, "x1 x2")))
    assert(out(2L) == ((6L, "y1 y2")))
  }

  test("a within-document repeat is duplicated content too") {
    val docs = Seq((1L, "p q r s m n p q r s")).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(docs, "doc_id", "text", 4).collect().head
    assert(out.getLong(1) == 10L && out.getLong(2) == 8L)
    assert(out.getString(3) == "m n")
  }

  test("an entirely-duplicated doc yields null clean_text; short docs pass untouched") {
    val docs = Seq(
      (1L, "p q r s"), (2L, "p q r s"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val out = DedupOps.substringDedupOf(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(out(1L) == ((4L, null)) && out(2L) == ((4L, null)))
    assert(out(3L) == ((0L, "a b")))
  }

  test("the window frame's plan uses the native graft_window_hashes expression") {
    // checkpointing hides the expression from the final query plan, so
    // the audit that the codegen pass (not the interpreted chain) is in
    // use inspects the pre-checkpoint frame
    val plan = DedupOps.windowRows(
      graft.Tables.documents(spark, sfDir), "doc_id", "text", DedupOps.substringW)
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_window_hashes"), plan.take(400))
  }

  test("corpus run: exact-duplicate docs are fully covered, removal never exceeds length") {
    val out = DedupOps.substringDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) == r.getLong(1)) assert(r.isNullAt(3))
    }
    // exact whole-doc duplicates (same text twice) must be fully removed
    val dupTexts = graft.Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(count(lit(1)).as("c"), min(col("doc_id")).as("d"))
      .filter(col("c") >= 2 && size(split(trim(col("text")), "\\s+")) >= DedupOps.substringW)
      .select("d").as[Long].collect().toSet
    if (dupTexts.nonEmpty) {
      val fully = rows.filter(r => dupTexts(r.getLong(0)))
      assert(fully.forall(r => r.getLong(2) == r.getLong(1)))
    }
  }
}
