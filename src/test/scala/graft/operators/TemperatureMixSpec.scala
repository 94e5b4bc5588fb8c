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

    // the planted skew keeps doc_id % k == 0 with k = 1 + ascii(last
    // name char) % 8: 'g' -> k=8 (docs 8..64 by 8 = 8), 'l' -> k=5
    // (65..80 by 5 = 4); expected counts derived by the same rule
    def k(src: String) = 1 + (src.last.toInt % 8)
    val expBig = (1L to 64L).count(_ % k("big") == 0)
    val expSmall = (65L to 80L).count(_ % k("small") == 0)
    assert(expBig > expSmall && expSmall >= 2) // the fixture discriminates

    val m = PipelineOps.temperatureMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("rate"), r.getAs[Long]("n_kept")))).toMap
    assert(m("small") == ((expSmall.toLong, 1.0, expSmall.toLong)))
    assert(m("big")._1 == expBig.toLong)
    val expRate = BigDecimal(math.sqrt(expSmall.toDouble / expBig))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("big")._2 == expRate)
    assert(m("big")._3 >= 1L && m("big")._3 < expBig.toLong) // downsampled, never emptied
    val rerun = PipelineOps.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kept"))).toMap
    assert(rerun("big") == m("big")._3 && rerun("small") == expSmall.toLong)
  }
}
