package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbedHealthSpec extends SparkSpec {

  test("planted damage is detected exactly; clean vectors are unit-norm healthy") {
    val rows = AnnOps.embedHealth(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val (nn, nz) = (r.getAs[Int]("n_nan"), r.getAs[Int]("n_zero"))
      // when-chain order: mod-13 wins over mod-17/19 on overlap
      if (id % 13 == 0) {
        assert(nz == 1 && nn == 0, s"vec $id zero-plant")
        assert(!r.getAs[Boolean]("healthy"))
      } else if (id % 17 == 0) {
        assert(nn == 1 && r.isNullAt(r.fieldIndex("norm_u")), s"vec $id nan-plant")
        assert(!r.getAs[Boolean]("healthy"))
      } else if (id % 19 == 0) {
        val nu = r.getAs[Long]("norm_u")
        assert(nu > 3000000L && nu < 3300000L, s"vec $id denorm $nu")
        assert(!r.getAs[Boolean]("healthy"))
      } else {
        val nu = r.getAs[Long]("norm_u")
        assert(nn == 0 && nz == 0 && math.abs(nu - 1000000L) <= 1,
          s"vec $id clean ($nn,$nz,$nu)")
        assert(r.getAs[Boolean]("healthy"))
        assert(r.getAs[Int]("dim") == 64)
      }
    }
    assert(rows.exists(_.getAs[Boolean]("healthy")) &&
      rows.exists(!_.getAs[Boolean]("healthy")))
  }

  test("verdict gates exactly what the ANN tier needs: every healthy vector is safe to index") {
    // healthy ⇒ finite, directional, ~unit norm: recompute from raw data
    import spark.implicits._
    val healthyIds = AnnOps.embedHealth(spark, sfDir)
      .filter(col("healthy")).select("vec_id").as[Long].collect().toSet
    val raw = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
    raw.filter(r => healthyIds(r.getAs[Long]("vec_id"))).foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.forall(x => !x.isNaN && x != 0.0f))
      val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      assert(norm > 0.89 && norm < 1.11)
    }
  }

  test("generic API validates an arbitrary vector frame plant-free, keeping the caller's id column") {
    import spark.implicits._
    val inv = 1.0f / math.sqrt(2.0).toFloat
    val df = Seq(
      // ids chosen ON the plant residues (%13, %17): the generic API
      // must not damage them — proof the fixture never leaks in
      (13L, Seq(inv, inv)),
      (17L, Seq(0.6f, 0.8f)),
      (2L, Seq(Float.NaN, 1.0f)),
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(3.0f, 4.0f))
    ).toDF("row_key", "vec")
    val out = AnnOps.embedHealthOf(df, col("row_key"), col("vec"))
    assert(out.columns.toSeq ==
      Seq("row_key", "dim", "n_nan", "n_zero", "norm_u", "healthy"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getAs[Int]("n_nan"), r.getAs[Int]("n_zero"),
        r.getAs[Boolean]("healthy")))).toMap
    assert(m(13L) == ((0, 0, true)))
    assert(m(17L) == ((0, 0, true)))
    assert(m(2L) == ((1, 0, false)))
    assert(m(3L) == ((0, 1, false)))
    assert(m(4L) == ((0, 0, false)))   // norm 5.0 — far off unit
  }
}
