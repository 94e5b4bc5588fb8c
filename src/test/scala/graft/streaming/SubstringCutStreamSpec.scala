package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupOps

class SubstringCutStreamSpec extends SparkSpec {

  test("streaming cut equals the incremental batch cut with each doc as its own batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = DedupOps.substringW
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .as[(Long, String)].collect().toSeq
    assert(batch.nonEmpty)
    val index = DedupOps.windowFreqOf(corpus, "doc_id", "text", w)
      .localCheckpoint()

    val stream = MemoryStream[(Long, String)]
    stream.addData(batch :+ (999999L -> null.asInstanceOf[String]))
    val q = EventStream.substringCutStream(
        stream.toDF().toDF("doc_id", "text"), index, w)
      .writeStream.format("memory").queryName("sub_cut")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    val streamed = keyed(spark.table("sub_cut").collect())

    // expectation: incremental batch cut, one doc at a time (the stream
    // convention — cross-doc batch duplication waits for index refresh)
    val expected = batch.map { case (id, text) =>
      val one = Seq((id, text)).toDF("doc_id", "text")
      keyed(DedupOps.substringDedupIncrementalOf(index, one, "doc_id", "text", w)
        .collect()).head
    }.toMap

    // null-text records are dropped, matching the batch operators
    assert(!streamed.contains(999999L))
    assert(streamed.keySet == expected.keySet)
    streamed.foreach { case (id, got) =>
      assert(got == expected(id), s"doc $id: $got vs ${expected(id)}")
    }
    // the batch genuinely exercises the cut: something was removed
    assert(streamed.values.exists(_._2 > 0))
  }
}
