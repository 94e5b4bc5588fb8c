package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EncodingOpsSpec extends SparkSpec {

  test("damage signals fire on exactly the planted docs, clean docs score 1e6 ppm") {
    val rows = EncodingOps.encodingQuality(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nr, nc, nm) = (r.getAs[Int]("n_replacement"),
        r.getAs[Int]("n_control"), r.getAs[Int]("n_mojibake"))
      assert((nr > 0) == (id % 7 == 0), s"doc $id replacement")
      assert((nc > 0) == (id % 11 == 0), s"doc $id control")
      assert((nm > 0) == (id % 5 == 0), s"doc $id mojibake")
      assert(if (id % 5 == 0) nm == 2 else nm == 0, s"doc $id mojibake count")
      assert(r.getAs[Boolean]("flagged") == (nr > 0 || nc > 0 || nm > 0))
      val ppm = r.getAs[Long]("ascii_ppm")
      // the base corpus is clean ASCII: an undamaged doc is exactly 1e6
      if (!r.getAs[Boolean]("flagged")) assert(ppm == 1000000L, s"doc $id ppm $ppm")
      else assert(ppm < 1000000L && ppm > 900000L, s"doc $id ppm $ppm")
    }
    // the gate discriminates: both verdicts occur
    assert(rows.exists(_.getAs[Boolean]("flagged")) &&
      rows.exists(!_.getAs[Boolean]("flagged")))
  }

  test("detectors on hand-built damage: double-encoded text, binary junk, decoder bailout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    Seq(
      // clean (ids chosen off every plant residue)
      (1L, "src0", "en", "perfectly ordinary ascii text"),
      // full double-encoded sentence: every accented char shows as a digraph
      (2L, "src0", "fr", "d\u00C3\u00A9j\u00C3\u00A0 vu \u00C3\u00A0 c\u00C3\u00B4t\u00C3\u00A9"),
      // binary junk: NUL + DEL + a C1 control
      (3L, "src1", "en", "head\u0000mid\u007Ftail\u0085end"),
      // decoder bailout markers
      (4L, "src1", "en", "a\uFFFDb\uFFFDc")
    ).toDF("doc_id", "source", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")

    val m = EncodingOps.encodingQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_replacement"), r.getAs[Int]("n_control"),
          r.getAs[Int]("n_mojibake"), r.getAs[Boolean]("flagged")))).toMap
    assert(m(1L) == ((0, 0, 0, false)))
    assert(m(2L) == ((0, 0, 5, true)))  // e-acute, a-grave x2, o-hat, e-acute digraphs
    assert(m(3L) == ((0, 3, 0, true)))  // NUL, DEL, NEL
    assert(m(4L) == ((2, 0, 0, true)))
  }

  test("generic API runs plant-free on an arbitrary frame and keeps the caller's id column") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      ("pageA", "clean crawl body"),
      // would collide with the %5 plant if the fixture leaked into the API
      ("pageB", "caf\u00C3\u00A9 mojibake"),
      ("pageC", "ctl\u0007bell")
    ).toDF("url", "body")
    val out = EncodingOps.encodingQualityOf(df, col("url"), col("body"))
    assert(out.columns.toSeq == Seq("url", "n_replacement", "n_control",
      "n_mojibake", "ascii_ppm", "flagged"))
    val m = out.collect().map(r => r.getString(0) ->
      ((r.getAs[Int]("n_mojibake"), r.getAs[Int]("n_control"),
        r.getAs[Boolean]("flagged")))).toMap
    assert(m("pageA") == ((0, 0, false)))
    assert(m("pageB") == ((1, 0, true)))
    assert(m("pageC") == ((0, 1, true)))
  }
}
