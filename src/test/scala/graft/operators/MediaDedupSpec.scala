package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaDedupSpec extends SparkSpec {

  import spark.implicits._

  private def mediaOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").select(col("doc_id"),
      lit("video").as("media_type"), encode(col("text"), "utf-8").as("payload"))

  test("identical payloads pair at overlap 1.0; disjoint payloads do not pair") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18"
    val media = mediaOf(
      1L -> base, 2L -> base,
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14 z15 z16")
    val frames = MultimodalOps.frameSampleOf(media, stride = 1)
    val pairs = MultimodalOps.mediaDedupOf(frames, MultimodalOps.mediaOverlapFrac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 == 1.0)
  }

  test("shared-prefix payloads pair when enough frames coincide") {
    // frames are 16-byte payload slices: a long shared prefix gives
    // shared leading frames even though the tails differ
    val prefix = ("p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 p13 p14 p15 p16 " * 4).trim
    val media = mediaOf(
      1L -> s"$prefix tailA1 tailA2",
      2L -> s"$prefix tailB1 tailB2 tailB3")
    val frames = MultimodalOps.frameSampleOf(media, stride = 1)
    val all = MultimodalOps.mediaDedupOf(frames, 0.0).collect()
    assert(all.nonEmpty, "shared-prefix videos must share frames")
    val r = all.head
    assert(r.getLong(2) >= 1L && r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("corpus run: overlaps are sane and duplicate-text videos pair at 1.0") {
    val pairs = MultimodalOps.mediaDedup(spark, sfDir).collect()
    pairs.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    // exact-duplicate texts that both landed in the video third must pair
    val dupVideoPairs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 2)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("id")).as[Long].collect().toSet
    if (dupVideoPairs.nonEmpty) {
      val paired = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      assert(dupVideoPairs.subsetOf(paired))
    }
  }
}
