package graft.operators

import graft.SparkSpec

class AnnOpsSpec extends SparkSpec {

  test("IVF recall vs brute force is reasonable at small scale") {
    val brute = AnnOps.annTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = AnnOps.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty && ivf.nonEmpty)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // synthetic embeddings have weak cluster structure; the contract is
    // recall well above the scan fraction (nprobe/K = 3/10). Lloyd-trained
    // centroids measure 0.62 here; 0.5 leaves headroom for seed placement.
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("brute-force ranks are dense 1..k per query") {
    val rows = AnnOps.annTopk(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"query $q ranks $ranks")
    }
  }
}
