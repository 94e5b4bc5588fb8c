package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemperatureMixSpec extends SparkSpec {

  test("rates follow sqrt(n_min/n), the smallest source keeps everything, kept counts track rates") {
    val rows = PipelineOps.temperatureMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nMin = rows.map(_.getAs[Long]("n_docs")).min
    rows.foreach { r =>
      val (n, rate, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Double]("rate"), r.getAs[Long]("n_kept"))
      assert(math.abs(rate - BigDecimal(math.sqrt(nMin.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"${r.getString(0)} rate $rate vs sqrt($nMin/$n)")
      assert(kept <= n)
      if (n == nMin) assert(kept == n, s"${r.getString(0)} min source must keep all")
      // hash-uniform accept: kept/n within a generous binomial band of rate
      val frac = kept.toDouble / n
      assert(math.abs(frac - math.min(1.0, math.sqrt(nMin.toDouble / n))) <
        4.0 / math.sqrt(n.toDouble) + 0.02, s"${r.getString(0)} kept frac $frac")
    }
  }

  test("hand-built skew: 4x source halves, decisions deterministic across runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tmix").toString
    val docs = (1L to 64L).map(i => (i, "big", "en", s"doc $i")) ++
      (65L to 80L).map(i => (i, "small", "en", s"doc $i"))
    docs.toDF("doc_id", "source", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")

    val m = PipelineOps.temperatureMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("rate"), r.getAs[Long]("n_kept")))).toMap
    assert(m("small") == ((16L, 1.0, 16L)))
    assert(m("big")._1 == 64L && m("big")._2 == 0.5)
    assert(m("big")._3 > 16L && m("big")._3 < 48L) // ~32 by hash, never degenerate
    val rerun = PipelineOps.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kept"))).toMap
    assert(rerun("big") == m("big")._3 && rerun("small") == 16L)
  }
}
