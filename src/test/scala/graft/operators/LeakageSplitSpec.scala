package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LeakageSplitSpec extends SparkSpec {

  private lazy val rows = PipelineOps.leakageSafeSplit(spark, sfDir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))

  test("every document is assigned exactly once, by its cluster's key") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == rows.length)
    // bucket = first hex digit of md5(cluster_id), split = bucket rule
    rows.foreach { case (_, cid, bucket, split) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(cid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(bucket == md.substring(0, 1))
      val expect = if (bucket <= "b") "train" else if (bucket <= "d") "val" else "test"
      assert(split == expect)
    }
  }

  test("no near-dup pair straddles a split boundary") {
    val split = rows.map(r => r._1 -> r._4).toMap
    val pairs = DedupOps.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dups $a/$b split across ${split(a)}/${split(b)}")
    }
  }

  test("cluster members all inherit the canonical's assignment") {
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._4).distinct.length == 1, s"cluster $cid mixed splits")
    }
  }
}
