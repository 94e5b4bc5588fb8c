package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private val capacity = 32

  private def summarize(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.agg(GraftFunctions.heavyHitters(col("h"), capacity).as("hh"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private lazy val tokens = graft.Tables.documents(spark, sfDir)
    .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    .select(xxhash64(col("tok")).as("h"))

  private lazy val exact: Map[Long, Long] = tokens
    .groupBy("h").count().collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("SpaceSaving guarantees hold on the token stream: coverage + overestimate bound") {
    val n = exact.values.sum
    val summary = summarize(tokens)
    assert(summary.size <= capacity && summary.nonEmpty)
    // coverage: every key with freq > n/capacity is present
    exact.filter(_._2 > n / capacity).keys.foreach { k =>
      assert(summary.contains(k), s"heavy key $k missing")
    }
    // overestimate-only, err bounds the overshoot
    summary.foreach { case (k, (c, e)) =>
      val t = exact.getOrElse(k, 0L)
      assert(c >= t, s"undercount for $k: $c < $t")
      assert(c - e <= t, s"err bound broken for $k: $c - $e > $t")
    }
  }

  test("guarantees survive adversarial repartitioning (mergeable summary)") {
    for (parts <- Seq(1, 7, 32)) {
      val summary = summarize(tokens.repartition(parts))
      val n = exact.values.sum
      exact.filter(_._2 > n / capacity).keys.foreach(k =>
        assert(summary.contains(k), s"parts=$parts heavy key $k missing"))
      summary.foreach { case (k, (c, _)) =>
        assert(c >= exact.getOrElse(k, 0L), s"parts=$parts undercount for $k")
      }
    }
  }

  test("conservative merge never undercounts a key evicted on one side") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    // Capacity 2. Side A sees [1,2,3]: key 1 is evicted by 3's arrival,
    // leaving {2:(1,0), 3:(2,1)}. Side B sees [1]: {1:(1,0)}. A naive
    // merge + truncate would report count(1)=1 < true 2; the
    // conservative combine must credit side A's minimum (1) to key 1.
    val agg = HeavyHittersAgg(BoundReference(0, LongType, nullable = false), capacity = 2)
    def feed(keys: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      keys.foreach(k => agg.update(b, InternalRow(k)))
      b
    }
    val merged = agg.merge(feed(Seq(1L, 2L, 3L)), feed(Seq(1L)))
    val exactCounts = Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
    merged.foreachEntry { (k, v) =>
      val t = exactCounts(k)
      assert(v._1 >= t, s"merged undercount for $k: ${v._1} < $t")
      assert(v._1 - v._2 <= t, s"merged err bound broken for $k")
    }
    // coverage: n=4, capacity=2 — key 1 (freq 2 > 4/2 is false; freq 2 == 2)
    // isn't forced by coverage, so pin the undercount fix directly:
    assert(merged.contains(1L) && merged(1L)._1 >= 2L,
      "key present on the small side must not undercount after merge")
    // symmetric orientation: small side as the accumulating buffer
    val mergedSym = agg.merge(feed(Seq(1L)), feed(Seq(1L, 2L, 3L)))
    assert(mergedSym.contains(1L) && mergedSym(1L)._1 >= 2L,
      "merge must be orientation-safe")
    mergedSym.foreachEntry { (k, v) =>
      assert(v._1 >= exactCounts(k), s"sym merged undercount for $k")
    }
  }

  test("a skewed stream's dominant keys rank first with exact-order counts") {
    import spark.implicits._
    // 1000 copies of key 1, 500 of key 2, singletons 100..1000
    val rows = (Seq.fill(1000)(1L) ++ Seq.fill(500)(2L) ++ (100L to 1000L)).toDF("h")
    val summary = summarize(rows)
    val top = summary.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(2)
    assert(top.map(_._1) == Seq(1L, 2L))
    assert(top.head._2._1 >= 1000L && top(1)._2._1 >= 500L)
  }
}
