package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  test("incremental probe equals the full rebuild's batch-vs-corpus pairs") {
    val docs = graft.Tables.documents(spark, sfDir)
    val batchIds = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // full rebuild over the whole corpus, restricted to cross pairs
    val full = DedupOps.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case ((a, b), _) => batchIds(a) ^ batchIds(b) }
      .map { case ((a, b), j) => // normalize to (new, corpus)
        (if (batchIds(a)) (a, b) else (b, a)) -> j
      }.toMap

    val incr = DedupOps.incrementalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(incr == full,
      s"incremental ${incr.size} pairs vs rebuild cross ${full.size}")
  }

  test("probe never pairs a batch doc with another batch doc") {
    val out = DedupOps.incrementalDedup(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"new_id ${r.getLong(0)} not in batch")
      assert(r.getLong(1) % 10 != 0, s"corpus_id ${r.getLong(1)} in batch")
    }
  }
}
