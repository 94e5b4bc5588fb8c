package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {

  test("exact graph restricted to the query prefix equals annTopk") {
    val topk = AnnOps.annTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val graph = AnnOps.knnGraph(spark, sfDir)
      .filter(col("query_id") < AnnOps.nQueries).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(graph == topk)
  }

  test("every vector gets dense ranks 1..k with no self edges") {
    val n = graft.Tables.embeddings(spark, sfDir).count()
    val rows = AnnOps.knnGraph(spark, sfDir).collect()
    assert(rows.length == n * AnnOps.topK)
    rows.foreach(r => assert(r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to AnnOps.topK), s"query $q")
    }
  }

  test("IVF graph recall vs the exact graph clears the probe floor") {
    val exact = AnnOps.knnGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = AnnOps.knnGraphIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty && ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // same contract as the annIvf spec: well above nprobe/K = 0.3
    assert(recall >= 0.5, s"kNN-graph IVF recall $recall")
  }
}
