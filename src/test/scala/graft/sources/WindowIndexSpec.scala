package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps

/** The substring-dedup artifact at scale: the corpus window-frequency
  * table persists bucketed on the window hash, so the incremental
  * batch cut reads the index co-located — the index side of the
  * frequency join sheds its exchange and only the (small) batch side
  * shuffles. */
class WindowIndexSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("incremental cut against a bucketed window index sheds the index-side exchange") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = DedupOps.windowFreqOf(corpus, "doc_id", "text", DedupOps.substringW)
    Bucketing.writeBucketed(idx.repartition(4, col("h")),
      "wspec_winfreq", "h", numBuckets = 4)

    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      def cut(i: org.apache.spark.sql.DataFrame) =
        DedupOps.substringDedupIncrementalOf(i, batch,
          "doc_id", "text", DedupOps.substringW)
      val bucketed = cut(Bucketing.table(spark, "wspec_winfreq"))
      val plain = cut(idx)

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      assert(exchanges(bucketed) < exchanges(plain),
        s"bucketed ${exchanges(bucketed)} vs plain ${exchanges(plain)}")

      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSet
      assert(rows(bucketed) == rows(plain))
    }
  }
}
