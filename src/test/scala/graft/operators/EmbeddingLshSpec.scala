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

  test("wider band geometry buys recall, still with exact precision") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val brute = DedupOps.embeddingPairsOf(e, "vec_id", "embedding",
      DedupOps.cosineThreshold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(planes: Int, bands: Int): Double = {
      val pairs = DedupOps.embeddingLshOf(e, "vec_id", "embedding",
        DedupOps.cosineThreshold, nHyperplanes = planes, nBands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.subsetOf(brute), "precision must stay exact")
      if (brute.isEmpty) 1.0 else pairs.size.toDouble / brute.size
    }
    // more bands of the same width = more chances to collide: recall
    // must not drop when the geometry widens (the production knob)
    assert(recallOf(32, 8) >= recallOf(16, 4))
  }
}
