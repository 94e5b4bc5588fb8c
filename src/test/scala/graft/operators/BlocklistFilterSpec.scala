package graft.operators

import graft.SparkSpec

class BlocklistFilterSpec extends SparkSpec {

  test("whole-word case-folded hits on exactly the planted docs; substrings never fire") {
    val rows = PipelineOps.blocklistFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Int]("n_blocked")
      val terms = r.getAs[String]("blocked_terms")
      val expected =
        (if (id % 6 == 0) Seq("blockterm0") else Nil) ++
          (if (id % 9 == 0) Seq("blockterm2") else Nil)
      // %7's xblockterm1y plant must NOT fire: word boundaries
      assert(n == expected.size, s"doc $id n_blocked $n vs $expected")
      assert(terms == expected.sorted.mkString(","), s"doc $id terms '$terms'")
      assert(r.getAs[Boolean]("keep") == expected.isEmpty)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")) &&
      rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("hand-built edge cases: punctuation boundaries, casing, repeats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-block").toString
    Seq(
      (1L, "src1", "en", "clean text entirely"),
      (2L, "src1", "en", "BlockTerm0! and (blockterm0) again"),
      (3L, "src1", "en", "xblockterm0 blockterm0x block term0"),
      (4L, "src1", "en", "blockterm1,blockterm2;blockterm1")
    ).toDF("doc_id", "source", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    val m = PipelineOps.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_blocked"), r.getAs[String]("blocked_terms"),
          r.getAs[Boolean]("keep")))).toMap
    assert(m(1L) == ((0, "", true)))
    assert(m(2L) == ((2, "blockterm0", false)))   // case-folded + punct-bounded
    assert(m(3L) == ((0, "", true)))              // substrings never fire
    assert(m(4L) == ((3, "blockterm1,blockterm2", false)))
  }

  test("generic API screens an arbitrary frame with a caller-supplied list, plant-free") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (10L, "totally fine prose"),
      (11L, "contains BadWord right here"),
      (12L, "literal bad.word present"),
      (13L, "badxword must not fire"),            // '.' must not act as regex any-char
      (14L, "xbadwordy never fires")
    ).toDF("id", "body")
    val m = PipelineOps.blocklistFilterOf(df, col("id"), col("body"),
        Seq("badword", "bad.word")).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_blocked"), r.getAs[String]("blocked_terms"),
          r.getAs[Boolean]("keep")))).toMap
    assert(m(10L) == ((0, "", true)))
    assert(m(11L) == ((1, "badword", false)))     // case-folded
    assert(m(12L) == ((1, "bad.word", false)))    // regex metachars quoted
    assert(m(13L) == ((0, "", true)))             // '.' matched literally only
    assert(m(14L) == ((0, "", true)))             // word boundaries hold
  }
}
