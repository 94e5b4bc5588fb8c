package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkDedupSpec extends SparkSpec {

  import spark.implicits._

  test("boilerplate chunks are removed from every doc, order preserved") {
    // "x y z" appears in 3 docs (df = 3 → boilerplate); "k l m" in 2
    // (kept); every other chunk is unique
    val docs = Seq(
      (1L, "a b c x y z d e f"),
      (2L, "x y z k l m"),
      (3L, "g h i k l m x y z"),
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = DedupOps.chunkDedupOf(docs, "doc_id", "text", 3, 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(1L) == ((3L, 1L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "k l m")))
    assert(out(3L) == ((3L, 1L, "g h i k l m")))
    assert(out(4L) == ((2L, 0L, "p q r s t")))
  }

  test("a doc that is all boilerplate yields null clean_text") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z"),
      (4L, "a b c x y z")
    ).toDF("doc_id", "text")
    val out = DedupOps.chunkDedupOf(docs, "doc_id", "text", 3, 3L)
    val allBoiler = out.filter(col("doc_id") === 1L).collect().head
    assert(allBoiler.isNullAt(3))
    assert(out.filter(col("doc_id") === 4L).collect().head.getString(3) == "a b c")
  }

  test("short tail chunk participates like any other chunk") {
    // 4 words with n=3 → chunks "a b c" + tail "d"; the tail "d"
    // repeats corpus-wide and is removed as boilerplate
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g d"), (3L, "h i j d")
    ).toDF("doc_id", "text")
    val out = DedupOps.chunkDedupOf(docs, "doc_id", "text", 3, 3L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "a b c", 2L -> "e f g", 3L -> "h i j"))
  }

  test("with an infinite cap nothing is removed: clean_text is the normalized text") {
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val out = DedupOps.chunkDedupOf(docs, "doc_id", "text", 3, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val norm = docs.select(col("doc_id"),
        array_join(split(trim(col("text")), "\\s+"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == norm)
  }

  test("corpus run removes something and never grows a document") {
    val out = DedupOps.chunkDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // removal is consistent: n_removed <= n_chunks, and clean_text word
    // count equals the kept chunks' words
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) == r.getLong(1)) assert(r.isNullAt(3))
    }
  }
}
