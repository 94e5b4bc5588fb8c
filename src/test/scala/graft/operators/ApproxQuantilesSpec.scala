package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxQuantilesSpec extends SparkSpec {

  test("sketch percentiles within 5% of exact; HLL distinct within 10%") {
    val approx = AnalyticsOps.approxQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val exact = AnalyticsOps.percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val exactDistinct = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    exact.foreach { case (k, (p50, p90, p99)) =>
      val (a50, a90, a99, _) = approx(k)
      assert(math.abs(a50 - p50) / p50 < 0.05, s"$k p50 $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.05, s"$k p90 $a90 vs $p90")
      assert(math.abs(a99 - p99) / p99 < 0.05, s"$k p99 $a99 vs $p99")
    }
    exactDistinct.foreach { case (k, n) =>
      val hll = approx(k)._4
      assert(math.abs(hll - n).toDouble / n < 0.10, s"$k hll $hll vs $n")
    }
  }
}
