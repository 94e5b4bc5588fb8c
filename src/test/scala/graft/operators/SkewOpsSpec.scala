package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // heavily skewed: 10k rows of key 1, a few of others
    val big = ((1 to 10000).map(_ => 1) ++ Seq(2, 2, 3)).toDF("k")
    val small = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    val salted = SkewOps.saltedJoin(big, small, "k", salt = 8)
      .groupBy("k", "v").count().orderBy("k")
    val plain = big.join(small, "k")
      .groupBy("k", "v").count().orderBy("k")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salt scatters a hot key across partitions") {
    import spark.implicits._
    val big = (1 to 1000).map(_ => 1).toDF("k")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)))
    val counts = salted.groupBy("__salt").count().collect()
    assert(counts.length == 8, s"expected 8 salt buckets, got ${counts.length}")
  }
}
