package graft.operators

import graft.SparkSpec

class EmbedCentroidsSpec extends SparkSpec {

  test("centroids are the per-label element-wise means") {
    val vecs = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble)))
    val expect = vecs.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> (vs.length.toLong,
        (0 until dim).map(i => vs.map(_._2(i)).sum / vs.length))
    }
    val out = AnnOps.embedCentroids(spark, sfDir).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, c) = expect(r.getInt(0))
      assert(r.getLong(1) == n)
      val got = r.getSeq[Double](2)
      assert(got.length == c.length)
      got.zip(c).foreach { case (a, b) => assert(math.abs(a - b) <= 1e-9) }
    }
  }

  test("label populations cover the whole corpus exactly once") {
    val total = graft.Tables.embeddings(spark, sfDir).count()
    val sum = AnnOps.embedCentroids(spark, sfDir).collect().map(_.getLong(1)).sum
    assert(sum == total)
  }
}
