package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps

/** The incremental dedup story at scale: the corpus signature index is
  * persisted bucketed on its join keys, so probing a new batch reads
  * the index co-located — the probe's corpus-side exchanges disappear
  * and only the (small) batch side shuffles. */
class IncrementalIndexSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("probe against a bucketed index sheds corpus-side exchanges, same pairs") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = DedupOps.nearDupIndexOf(corpus, "doc_id", "text")
    Bucketing.writeBucketed(idx.bands.repartition(4, col("band_key")),
      "ispec_bands", "band_key", numBuckets = 4)
    Bucketing.writeBucketed(idx.shingles.repartition(4, col("doc_id")),
      "ispec_shingles", "doc_id", numBuckets = 4)

    // no broadcast (at scale the index never broadcasts), no AQE (keep
    // the exchange count a static plan property)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      def probe(i: DedupOps.NearDupIndex) =
        DedupOps.incrementalNearDupsOf(i, batch, "doc_id", "text",
          DedupOps.jaccardThreshold)
      val bucketed = probe(DedupOps.NearDupIndex(
        Bucketing.table(spark, "ispec_bands"),
        Bucketing.table(spark, "ispec_shingles")))
      val plain = probe(idx)

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      assert(exchanges(bucketed) < exchanges(plain),
        s"bucketed ${exchanges(bucketed)} vs plain ${exchanges(plain)}")

      val a = bucketed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"bucketed ${a.size} pairs vs plain ${b.size}")
    }
  }
}
