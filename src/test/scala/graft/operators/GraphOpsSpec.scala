package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  test("integer PageRank: mass conserved within floor-division slack, every node ranked") {
    val ranks = GraphOps.pagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(ranks.length === n, "one rank row per vector")
    assert(ranks.forall(_._2 > 0), "damping keeps every rank positive")
    // floor divisions only ever LOSE units: total mass stays within
    // (iters+1) * N lost units of the initial scale, never above it
    val total = ranks.map(_._2).sum
    assert(total <= GraphOps.pagerankScale, s"mass created: $total")
    val slack = (GraphOps.pagerankIters + 2).toLong * n * 2
    assert(total >= GraphOps.pagerankScale - slack * 100,
      s"mass lost beyond floor-division slack: $total")
    // ranks differentiate: the kNN graph is not rank-uniform
    assert(ranks.map(_._2).distinct.length > 1, "degenerate uniform ranks")
  }

  test("integer PageRank is partitioning-invariant (exact integer fixpoint)") {
    val a = GraphOps.pagerank(spark, sfDir).collect().toSeq
    val b = GraphOps.pagerank(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("pagerankOf on an irregular graph with a dangling node matches a driver-side reference") {
    import spark.implicits._
    // 1→2, 1→3, 2→1; node 3 dangling — exercises per-node out-degree
    // (deg(1)=2, deg(2)=1) and dangling-mass drop, which the k-regular
    // kNN twin never does
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("vec_id")
    val got = GraphOps.pagerankOf(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the same floor-division fixpoint, evaluated driver-side
    val scale = GraphOps.pagerankScale
    val n = 3L
    val deg = Map(1L -> 2L, 2L -> 1L)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L))
    var r = Map(1L -> scale / n, 2L -> scale / n, 3L -> scale / n)
    for (_ <- 1 to GraphOps.pagerankIters) {
      val cin = out.toSeq
        .flatMap { case (s, ds) => ds.map(d => d -> r(s) / deg(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = Seq(1L, 2L, 3L).map(v =>
        v -> ((15L * (scale / n)) / 100L + (85L * cin.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(got === r)
  }

  test("IVF-edge PageRank: same invariants, rank agreement with the exact twin at fixture recall") {
    val exact = GraphOps.pagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ivf = GraphOps.pagerankIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(ivf.size === n, "one rank row per vector")
    assert(ivf.values.forall(_ > 0), "damping keeps every rank positive")
    assert(ivf.values.sum <= GraphOps.pagerankScale, "mass created")
    // rank ORDER (what curation consumes) must broadly agree with the
    // exact twin: top-decile hub overlap well above chance
    val top = math.max(5, (n / 10).toInt)
    val topExact = exact.toSeq.sortBy { case (v, r) => (-r, v) }.take(top).map(_._1).toSet
    val topIvf = ivf.toSeq.sortBy { case (v, r) => (-r, v) }.take(top).map(_._1).toSet
    // chance overlap for a top-decile set is 0.1; the fixture's IVF
    // edge recall floor is 0.5 (KnnGraphSpec), which carries through
    // the rank fixpoint as ~0.4 hub overlap — pin ≥ 3× chance
    val overlap = (topExact intersect topIvf).size.toDouble / top
    assert(overlap >= 0.3, s"top-$top hub overlap $overlap vs exact twin")
  }
}
