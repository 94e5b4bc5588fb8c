package graft.operators

import graft.SparkSpec

class EmbeddingLshSpec extends SparkSpec {

  test("hyperplane LSH: exact precision, honest recall vs brute force") {
    // oracle twin: the brute-force all-pairs operator (spec-only path)
    val brute = DedupOps.embeddingPairsOf(
      graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      DedupOps.cosineThreshold).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = DedupOps.embeddingDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // precision 1.0: every LSH pair is a true pair with identical cosine
    lsh.foreach { case (pair, c) =>
      assert(brute.contains(pair), s"false positive $pair")
      assert(brute(pair) == c)
    }
    // recall: 4x4 banded hyperplanes at cosine>=0.4 (~66 deg) is a weak
    // locality regime; require it to beat a trivial sampler meaningfully
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.25, s"recall $recall over ${brute.size} true pairs")
    }
  }
}
