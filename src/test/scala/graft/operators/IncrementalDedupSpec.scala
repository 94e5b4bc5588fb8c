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

  test("probe equals the brute-force exact-Jaccard cross pairs (oracle identity)") {
    // the driver hash-checks q_dedup_incremental against a brute-force
    // DuckDB twin — valid because verification is exact Jaccard and LSH
    // banding recalls every true pair on these corpora; this pins the
    // same identity against the exact posting-list miner Spark-side
    val exact = DedupOps.ngramJaccardHashedOf(
        DedupOps.shingleHashes(spark, sfDir), DedupOps.jaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case ((a, b), _) => (a % 10 == 0) ^ (b % 10 == 0) }
      .map { case ((a, b), j) =>
        (if (a % 10 == 0) (a, b) else (b, a)) -> j }.toMap
    val incr = DedupOps.incrementalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(incr == exact, s"incremental ${incr.size} vs exact ${exact.size}")
  }

  test("duplicating every doc leaves the original-pair set and values unchanged") {
    // pins the duplicate-collapse claim directly: near-dup pairs among
    // the ORIGINAL ids must be identical (ids and jaccard doubles) when
    // every document gains an id-shifted exact copy
    val shift = 10000000L
    val sets = DedupOps.shingleHashes(spark, sfDir)
    val doubled = sets.unionByName(
      sets.withColumn("doc_id", col("doc_id") + shift))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val base = pairs(DedupOps.ngramJaccardHashedOf(sets, DedupOps.jaccardThreshold))
    val dup = pairs(DedupOps.ngramJaccardHashedOf(doubled, DedupOps.jaccardThreshold))
      .filter { case ((a, b), _) => a < shift && b < shift }
    assert(dup == base, s"dup-restricted ${dup.size} vs base ${base.size}")
  }

  test("probe never pairs a batch doc with another batch doc") {
    val out = DedupOps.incrementalDedup(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"new_id ${r.getLong(0)} not in batch")
      assert(r.getLong(1) % 10 != 0, s"corpus_id ${r.getLong(1)} in batch")
    }
  }
}
