package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenBudgetMixSpec extends SparkSpec {

  private def mix() = BpeOps.tokenBudgetMix(spark, sfDir).collect()

  test("every source lands within one document of its token budget") {
    val rows = mix()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val total = rs.map(_.getLong(2)).sum
      val budget = total >> 1
      val keptMass = rs.filter(_.getBoolean(4)).map(_.getLong(2)).sum
      // exact-quota contract: kept mass reaches the budget and overshoots
      // by at most the final admitted document (cum_before < budget admits
      // the crossing doc).
      assert(keptMass >= budget || rs.forall(_.getBoolean(4)),
        s"$src under budget: $keptMass < $budget")
      val overshoot = keptMass - budget
      val maxDoc = rs.map(_.getLong(2)).max
      assert(overshoot <= maxDoc, s"$src overshoot $overshoot > max doc $maxDoc")
    }
  }

  test("both verdict classes are populated and cum_before is consistent") {
    val rows = mix()
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
    // replay the selection order host-side: cum_before must equal the
    // running sum over (lehmer(doc_id), doc_id) order within each source
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val ordered = rs.sortBy(r => (BpeOps.lehmerKey(r.getLong(0)),
        r.getLong(0)))
      var running = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == running,
          s"$src doc ${r.getLong(0)} cum_before ${r.getLong(3)} != $running")
        running += r.getLong(2)
      }
    }
  }

  test("selection is invariant under input partitioning") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(size(filter(split(col("text"), " "), w => length(w) > 0)) >= 1)
      .withColumn("n_tokens",
        size(BpeOps.bpeTokens(filter(split(col("text"), " "), w => length(w) > 0))))
    def run(df: org.apache.spark.sql.DataFrame) =
      BpeOps.tokenBudgetMixOf(df, col("doc_id"), col("source"),
        col("n_tokens"), t => shiftright(t, 1))
        .orderBy("doc_id").collect().toSeq
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }
}
