package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringIncrementalSpec extends SparkSpec {

  import spark.implicits._

  private val w = 4

  test("incremental batch rows equal the full rebuild over corpus + batch") {
    val corpus = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpusSpan = corpus.orderBy("doc_id").limit(1)
      .select(array_join(slice(split(trim(col("text")), "\\s+"), 1, w), " "))
      .as[String].head()
    val batch = Seq(
      (1000000L, s"zx1 zx2 $corpusSpan zx3"),       // duplicates a corpus span
      (1000001L, "qa qb qc qd m1 m2 qa qb qc qd"),  // within-batch repeat
      (1000002L, "u1 u2 u3 u4 u5 u6")               // clean
    ).toDF("doc_id", "text")

    val index = DedupOps.windowFreqOf(corpus, "doc_id", "text", w)
      .localCheckpoint()
    val inc = DedupOps.substringDedupIncrementalOf(index, batch, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap

    val full = DedupOps.substringDedupOf(corpus.unionByName(batch), "doc_id", "text", w)
      .filter(col("doc_id") >= 1000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap

    assert(inc == full)
    // and the batch genuinely exercises all three cases
    assert(inc(1000000L)._2 >= w)              // corpus-dup span removed
    assert(inc(1000001L)._2 >= 2L * w)         // both within-batch copies removed
    assert(inc(1000002L) == ((6L, 0L, "u1 u2 u3 u4 u5 u6")))
  }

  test("an empty batch-vs-corpus overlap leaves only within-batch duplication") {
    val index = DedupOps.windowFreqOf(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      "doc_id", "text", w).localCheckpoint()
    val batch = Seq((1L, "n1 n2 n3 n4 n5")).toDF("doc_id", "text")
    val out = DedupOps.substringDedupIncrementalOf(index, batch, "doc_id", "text", w)
      .collect().head
    assert(out.getLong(2) == 0L && out.getString(3) == "n1 n2 n3 n4 n5")
  }
}
