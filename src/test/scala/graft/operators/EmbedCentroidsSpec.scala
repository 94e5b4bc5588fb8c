package graft.operators

import graft.SparkSpec

class EmbedCentroidsSpec extends SparkSpec {

  test("centroid rows are the per-label element-wise means") {
    val vecs = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble)))
    val expect = vecs.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> (vs.length.toLong,
        (0 until dim).map(i => vs.map(_._2(i)).sum / vs.length))
    }
    val out = AnnOps.embedCentroids(spark, sfDir).collect()
    val byLabel = out.groupBy(_.getInt(0))
    assert(byLabel.keySet == expect.keySet)
    byLabel.foreach { case (l, rows) =>
      val (n, c) = expect(l)
      assert(rows.length == c.length) // one row per dimension
      rows.foreach { r =>
        assert(r.getLong(1) == n)
        assert(math.abs(r.getDouble(3) - c(r.getInt(2))) <= 1e-9)
      }
    }
  }

  test("output is one scalar row per (label, dimension), idx-ordered") {
    val out = AnnOps.embedCentroids(spark, sfDir).collect()
    // scalar shape: no array/struct columns (driver-gate contract)
    assert(out.head.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|struct|map")))
    // per label, idx runs 0..dim-1 without gaps
    out.groupBy(_.getInt(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (0 until rows.length))
    }
  }

  test("outliers are each label's farthest-from-centroid vectors, exactly floor(frac*n) of them") {
    val vecs = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble)))
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> (0 until dim).map(i => vs.map(_._3(i)).sum / vs.length)
    }
    val expectDist = vecs.map { case (id, l, v) =>
      id -> math.sqrt(v.zip(cents(l)).map { case (x, m) => (x - m) * (x - m) }.sum)
    }.toMap
    val rows = AnnOps.embedOutliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getBoolean(4)))
    assert(rows.length == vecs.length)
    rows.foreach { case (id, _, d, _, _) =>
      assert(math.abs(d - expectDist(id)) <= 1e-6)
    }
    rows.groupBy(_._2).foreach { case (l, rs) =>
      val cut = math.floor(AnnOps.outlierFrac * rs.length).toInt
      assert(rs.count(_._5) == cut, s"label $l outlier count")
      // flagged vectors are exactly the top-ranked (farthest) ones
      assert(rs.filter(_._5).map(_._4).sorted.toSeq == (1 to cut))
      val flaggedMin = if (cut > 0) rs.filter(_._5).map(_._3).min else Double.MaxValue
      assert(rs.filterNot(_._5).forall(_._3 <= flaggedMin + 1e-9))
    }
  }

  test("label populations cover the whole corpus exactly once") {
    val total = graft.Tables.embeddings(spark, sfDir).count()
    val perLabel = AnnOps.embedCentroids(spark, sfDir).collect()
      .groupBy(_.getInt(0)).values.map(_.head.getLong(1))
    assert(perLabel.sum == total)
  }
}
