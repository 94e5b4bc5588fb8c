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

  test("cluster count follows the K ≈ √N rule with a kClusters floor") {
    // test corpora stay at the floor — specs/bench outputs unchanged
    assert(AnnOps.adaptiveK(500) == AnnOps.kClusters)
    assert(AnnOps.adaptiveK(2000) == AnnOps.kClusters)
    // beyond the floor K grows as √(N/targetCellSize)
    assert(AnnOps.adaptiveK(20000) == 31)
    assert(AnnOps.adaptiveK(2000000) == 316)
    // monotone: a bigger corpus never trains fewer clusters
    val ks = Seq(1L, 500L, 2000L, 20000L, 200000L).map(AnnOps.adaptiveK)
    assert(ks == ks.sorted)
  }

  test("trained cluster count matches adaptiveK of the corpus size") {
    val e = AnnOps.embeddingsWithNorm(spark, sfDir)
    val k = AnnOps.centroidsOf(e).count()
    assert(k == AnnOps.adaptiveK(e.count()))
  }

  test("brute-force ranks are dense 1..k per query") {
    val rows = AnnOps.annTopk(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"query $q ranks $ranks")
    }
  }

  test("a persisted index searches identically to the inline-trained one") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("ann-index").toString
    val e = AnnOps.embeddingsWithNorm(spark, sfDir)
    val q = e.filter(col("vec_id") < AnnOps.nQueries)
    val inline = AnnOps.buildIndex(e)
    AnnOps.writeIndex(inline, tmp)
    val loaded = AnnOps.loadIndex(spark, tmp)

    val ivfInline = AnnOps.annIvfSearch(q, inline.centroids, inline.assigned)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val ivfLoaded = AnnOps.annIvfSearch(q, loaded.centroids, loaded.assigned)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(ivfInline.nonEmpty && ivfInline == ivfLoaded)

    val pqInline = AnnOps.annPqSearch(e, inline.codebook, inline.encoded)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val pqLoaded = AnnOps.annPqSearch(e, loaded.codebook, loaded.encoded)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(pqInline.nonEmpty && pqInline == pqLoaded)
  }

  test("repeated driver queries reuse the session-cached artifacts (no retrain)") {
    // Two calls must return identical rows; the second must be served
    // from the cache (same trained-frame instances).
    val first = AnnOps.annIvf(spark, sfDir).collect().toSeq
    val ivf1 = AnnOps.ivfFor(spark, sfDir)
    val second = AnnOps.annIvf(spark, sfDir).collect().toSeq
    val ivf2 = AnnOps.ivfFor(spark, sfDir)
    assert(first == second)
    assert((ivf1._1 eq ivf2._1) && (ivf1._2 eq ivf2._2))
    val pq1 = AnnOps.pqFor(spark, sfDir)
    val pq2 = AnnOps.pqFor(spark, sfDir)
    assert((pq1._1 eq pq2._1) && (pq1._2 eq pq2._2))
  }
}
