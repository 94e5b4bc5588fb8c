package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyDedupSpec extends SparkSpec {

  private lazy val rows = DedupOps.fuzzyDedup(spark, sfDir).collect()
  private lazy val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every document appears once; exactly one keeper per cluster") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getLong(1)).foreach { case (c, rs) =>
      assert(rs.count(_.getBoolean(4)) == 1, s"cluster $c keepers")
      assert(rs.forall(_.getLong(3) == rs.length), s"cluster $c n_members")
    }
  }

  test("verified LSH pairs always share a cluster; isolated docs keep themselves") {
    val pairs = DedupOps.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    rows.filterNot(r => paired(r.getLong(0))).foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getBoolean(4),
        s"isolated doc ${r.getLong(0)}")
    }
  }

  test("fuzzy keep verdict equals the exact-pair keep verdict (oracle identity)") {
    // the driver hash-checks q_fuzzy_dedup against dedupKeepSql — valid
    // because LSH verify is exact and banding recalls every true pair
    // on these corpora; this pins the same identity Spark-side
    val exact = DedupOps.dedupKeep(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(rows.map(_.toSeq).toSeq == exact)
  }

  test("the keeper is the longest member, ties to the smallest id") {
    val len = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val keeper = rs.find(_.getBoolean(4)).get.getLong(0)
      val best = rs.map(_.getLong(0)).minBy(id => (-len(id), id))
      assert(keeper == best)
    }
  }
}
