package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PplBucketsSpec extends SparkSpec {

  test("buckets are monotone in score within a language and only null scores are unscored") {
    val rows = QualityModelOps.pplBuckets(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val legal = Set("head", "middle", "tail", "unscored")
    rows.foreach { r =>
      assert(legal(r.getString(3)))
      assert(r.isNullAt(2) == (r.getString(3) == "unscored"))
    }
    // within each language every head score >= every middle >= every tail
    rows.filter(!_.isNullAt(2)).groupBy(_.getString(1)).foreach { case (_, rs) =>
      def scores(b: String) = rs.filter(_.getString(3) == b).map(_.getDouble(2))
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      if (h.nonEmpty && m.nonEmpty) assert(h.min >= m.max)
      if (m.nonEmpty && t.nonEmpty) assert(m.min >= t.max)
    }
  }

  test("the tercile cut actually splits the dominant language near thirds") {
    val rows = QualityModelOps.pplBuckets(spark, sfDir)
      .filter(col("mean_log_prob").isNotNull).collect()
    val (lang, rs) = rows.groupBy(_.getString(1)).maxBy(_._2.length)
    assert(rs.length >= 9, s"dominant lang $lang too small to cut")
    val n = rs.length.toDouble
    Seq("head", "middle", "tail").foreach { b =>
      val frac = rs.count(_.getString(3) == b) / n
      assert(frac > 0.1 && frac < 0.6, s"$lang/$b fraction $frac not tercile-like")
    }
  }

  test("scores agree with lmPerplexity per doc") {
    val lm = QualityModelOps.lmPerplexity(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    QualityModelOps.pplBuckets(spark, sfDir).collect().foreach { r =>
      val expect = lm(r.getLong(0))
      if (expect == null) assert(r.isNullAt(2))
      else assert(r.getDouble(2) == expect)
    }
  }
}
