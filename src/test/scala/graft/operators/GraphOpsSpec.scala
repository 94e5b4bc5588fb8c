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
}
