package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keyset-pagination protocol: looping scanPage with the returned resume
  * token must tile the filtered sorted scan exactly — no gaps, no
  * overlaps, deterministic order — and terminate on the empty page,
  * mirroring the reference's LastEvaluatedKey loop
  * (aws/dynamo_manager.py:216-230). */
class ScanPageSpec extends SparkSpec {

  test("pages tile the filtered scan exactly and the loop terminates") {
    val orders = graft.Tables.orders(spark, sfDir)
    val fields = Seq("o_orderkey", "o_totalprice")
    val filters = Seq(ScanFilter("o_totalprice", ">", 100000.0))
    val size = 150

    val full = ScanOps.scan(orders, fields, filters)
      .orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(full.size > 2 * size, "need at least three pages for the loop to be exercised")

    var token: Option[Any] = None
    var pages = Vector.empty[Seq[Long]]
    var rounds = 0
    while ({
      val page = ScanOps.scanPage(orders, "o_orderkey", size, token, fields, filters)
      val keys = page.orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
      token = ScanOps.resumeToken(page, "o_orderkey")
      if (keys.nonEmpty) pages :+= keys
      rounds += 1
      assert(rounds <= full.size / size + 2, "pagination loop must terminate")
      keys.nonEmpty
    }) ()

    assert(pages.init.forall(_.size == size), "every page but the last is full")
    assert(pages.flatten == full, "pages concatenate to exactly the full sorted scan")
  }

  test("resume token of an exhausted scan is None") {
    val orders = graft.Tables.orders(spark, sfDir)
    val empty = ScanOps.scanPage(orders, "o_orderkey", 10,
      resumeAfter = Some(Long.MaxValue))
    assert(ScanOps.resumeToken(empty, "o_orderkey").isEmpty)
  }

  test("composite-key pages tile the scan exactly (LastEvaluatedKey shape)") {
    // (o_custkey, o_orderkey): duplicated partition-key component +
    // unique sort key — the composite-token analog of Dynamo's
    // (partition, sort) key, with real boundary ties on o_custkey
    val orders = graft.Tables.orders(spark, sfDir)
    val fields = Seq("o_custkey", "o_orderkey", "o_totalprice")
    val size = 120
    val full = ScanOps.scan(orders, fields)
      .orderBy("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full.size > 2 * size)
    assert(full.map(_._1).distinct.size < full.size,
      "o_custkey must repeat so the token's tie-break half is exercised")

    var token: Option[(Any, Any)] = None
    var pages = Vector.empty[Seq[(Long, Long)]]
    var rounds = 0
    while ({
      val page = ScanOps.scanPageComposite(orders, "o_custkey", "o_orderkey",
        size, token, fields)
      val keys = page.orderBy("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      token = ScanOps.resumeTokenComposite(page, "o_custkey", "o_orderkey")
      if (keys.nonEmpty) pages :+= keys
      rounds += 1
      assert(rounds <= full.size / size + 2, "loop must terminate")
      keys.nonEmpty
    }) ()
    assert(pages.init.forall(_.size == size))
    assert(pages.flatten == full, "composite pages tile the full sorted scan")
  }

  test("the keyset predicate reaches the parquet scan") {
    val orders = graft.Tables.orders(spark, sfDir)
    val page = ScanOps.scanPage(orders, "o_orderkey", 10, resumeAfter = Some(1000L),
      fields = Seq("o_orderkey", "o_totalprice"))
    val plan = page.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(o_orderkey,1000)"),
      s"resume predicate must be pushed to the scan:\n$plan")
  }
}
