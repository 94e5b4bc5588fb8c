package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnPqSpec extends SparkSpec {

  test("PQ-ADC top-k recalls a solid share of the exact top-k") {
    val brute = AnnOps.annTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = AnnOps.annPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pq.size == brute.size, "same (query, k) shape")
    val recall = brute.count(pq.contains).toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall over ${brute.size} exact pairs")
  }

  test("training is deterministic: two runs produce identical codebooks") {
    val a = AnnOps.pqCodebook(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val b = AnnOps.pqCodebook(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(a == b)
  }

  test("every vector encodes to one code per subspace") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val n = e.count()
    val sub = AnnOps.pqEncodeOf(
      AnnOps.pqSubvectorsForTest(spark, sfDir),
      AnnOps.pqCodebook(spark, sfDir))
    val perVec = sub.groupBy("vec_id").count().collect()
    assert(perVec.length == n)
    perVec.foreach(r => assert(r.getLong(1) == AnnOps.pqSubspaces))
    val codes = sub.agg(min("code"), max("code")).collect().head
    assert(codes.getInt(0) >= 0 && codes.getInt(1) < AnnOps.pqCodes)
  }
}
