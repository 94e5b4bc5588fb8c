package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{AnnOps, GraphOps}

/** The PageRank scale configuration as a PLAN property, not a
  * docstring: with the edge table persisted bucketed on `src` (and the
  * iteration told not to checkpoint it away), the fat side of every
  * iteration — the edge scan, its degree rollup, and its side of the
  * per-iteration join — runs with no Exchange at all; only the
  * node-sized rank frame shuffles. Ranks are exact integers, so the
  * bucketed run must equal the registered row bit for bit. */
class BucketedPageRankSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("bucketed edge table: per-iteration edge side is exchange-free, ranks identical") {
    val edges = AnnOps.knnGraph(spark, sfDir)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    Bucketing.writeBucketed(edges.repartition(4, col("src")),
      "prspec_edges", "src", numBuckets = 4)
    val nodes = Tables.embeddings(spark, sfDir).select(col("vec_id"))

    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      edges.write.mode("overwrite").saveAsTable("prspec_edges_plain")
      val bucketed = GraphOps.pagerankOf(
        Bucketing.table(spark, "prspec_edges"), nodes, cutEdges = false)
      val plain = GraphOps.pagerankOf(
        Bucketing.table(spark, "prspec_edges_plain"), nodes, cutEdges = false)

      val bPlan = bucketed.queryExecution.executedPlan.toString
      val pPlan = plain.queryExecution.executedPlan.toString
      def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
      // the bucketed scan must surface its layout to the planner...
      assert(bPlan.contains("Bucketed: true"), s"no bucketed scan:\n$bPlan")
      // ...and save the edge-side exchange of EVERY iteration plus the
      // degree rollup's — strictly fewer shuffles than the plain table
      assert(exchanges(bPlan) < exchanges(pPlan),
        s"bucketed=${exchanges(bPlan)} plain=${exchanges(pPlan)}")

      // exact-integer ranks: all three paths agree bit for bit
      val reg = GraphOps.pagerank(spark, sfDir).collect().toSeq
      assert(bucketed.collect().toSeq == reg)
      assert(plain.collect().toSeq == reg)
    }
  }
}
