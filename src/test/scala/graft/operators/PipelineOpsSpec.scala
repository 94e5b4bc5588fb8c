package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("hash split is total, deterministic, and roughly 12/2/2") {
    val split = PipelineOps.hashSplit(spark, sfDir).cache()
    val total = split.count()
    assert(total == 500) // every document gets exactly one split
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // binomial bounds wide enough to never flake at n=500
    assert(bySplit("train") > 300 && bySplit("train") < 430)
    assert(bySplit("val") > 25 && bySplit("test") > 25)
    // determinism: same corpus, same assignment
    val again = PipelineOps.hashSplit(spark, sfDir)
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
    split.unpersist()
  }

  test("corpus mix keeps all of tier 0 and downsamples tier 3 hardest") {
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("tier", substring(col("source"), 4, 10).cast("int") % 4)
      .groupBy("tier").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = PipelineOps.corpusMix(spark, sfDir)
      .groupBy("tier").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept(0) == docs(0)) // rate 1.0: everything survives
    assert(kept(3) < kept(1))  // rate 0.1 keeps fewer than rate 0.5
    // weighted count is an unbiased estimate of the full corpus size
    val est = PipelineOps.corpusMix(spark, sfDir)
      .agg(sum("weight")).collect()(0).getDouble(0)
    assert(est > 250 && est < 750, s"weighted estimate $est far from 500")
  }

  test("language rebalance: data-derived rates move shares toward uniform, never upsample") {
    val rows = PipelineOps.langRebalance(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val target = total.toDouble / rows.length
    rows.foreach { case (lang, n, rate, kept) =>
      assert(kept <= n && rate <= 1.0, s"$lang upsampled")
      if (n <= target) {
        // under-represented: keep everything
        assert(rate == 1.0 && kept == n, s"$lang should keep all")
      } else {
        // over-represented: sampled toward the uniform share (hash
        // sampling is deterministic but not exact-count — allow slack)
        assert(math.abs(rate - target / n) <= 1e-6, s"$lang rate")
        assert(kept <= n && kept >= (target * 0.5).toLong, s"$lang kept $kept")
        assert(kept < n, s"$lang not downsampled at all")
      }
    }
  }

  test("semantic decontamination flags exactly the above-threshold corpus vectors") {
    val got = PipelineOps.semanticDecontam(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // brute-force recomputation
    val vecs = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val (evals, corpus) = vecs.partition(_._1 < AnnOps.nQueries)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = corpus.flatMap { case (id, v) =>
      val best = evals.map { case (qid, qv) => (cos(v, qv), qid) }
        .maxBy { case (c, qid) => (c, -qid) }
      if (best._1 >= PipelineOps.semanticCosine) Some((id, best._2)) else None
    }.toSet
    assert(got.map(p => (p._1, p._2)).toSet === expected)
    got.foreach { case (_, eid, c) =>
      assert(eid < AnnOps.nQueries && c >= PipelineOps.semanticCosine)
    }
  }

  test("domain cap bounds every source at the cap") {
    val capped = PipelineOps.domainCapped(spark, sfDir)
    val perSource = capped.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= PipelineOps.domainCap))
    assert(capped.agg(max("rk")).collect()(0).getInt(0) <= PipelineOps.domainCap)
  }

  test("packing is gapless per source and offsets stay under budget") {
    val packed = PipelineOps.packSequences(spark, sfDir).cache()
    assert(packed.filter(col("pack_offset") >= PipelineOps.packBudget).isEmpty)
    assert(packed.filter(col("pack_offset") < 0).isEmpty)
    // the token stream is contiguous: doc k's pack/offset equal the
    // running token total of docs before it (within its source)
    val recomputed = packed
      .withColumn("cum", coalesce(sum("n_tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(floor(col("cum") / PipelineOps.packBudget) =!= col("pack_id") ||
        (col("cum") % PipelineOps.packBudget) =!= col("pack_offset"))
    assert(recomputed.isEmpty)
    packed.unpersist()
  }

  test("contamination flags the docs sharing shingles with the eval set") {
    val c = PipelineOps.contamination(spark, sfDir).cache()
    // eval docs themselves are excluded from the scored set
    assert(c.filter(col("doc_id") % 97 === 0).isEmpty)
    // fractions are well-formed
    assert(c.filter(col("overlap_frac") < 0 || col("overlap_frac") > 1).isEmpty)
    // flag agrees with the threshold everywhere
    assert(c.filter(col("contaminated") =!=
      (col("overlap_frac") > PipelineOps.contaminationFrac)).isEmpty)
    c.unpersist()
  }

  test("bloom-prefiltered contamination equals the exact gate on every row") {
    val exact = PipelineOps.contamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4))).toSet
    val bloom = PipelineOps.contaminationBloom(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4))).toSet
    assert(exact.nonEmpty && bloom == exact,
      "the exact verify join must absorb every bloom false positive")
  }

  test("bloom prefilter kills ~all non-overlap shingles map-side") {
    val hs = graft.operators.DedupOps.shingleHashes(spark, sfDir)
    val bench = hs.filter(col("doc_id") % 97 === 0)
    val bloom = PipelineOps.evalBloomOf(bench)
    assert(bloom.length > 0 && bloom.length < (1 << 20),
      s"bloom should be compact, got ${bloom.length} bytes")
    val gated = PipelineOps.contaminationBloomHashedOf(
      hs.filter(col("doc_id") % 97 =!= 0), bench, bloom,
      PipelineOps.contaminationFrac)
    // the bloom gate appears as a plain Filter on the scan side —
    // a binary literal, not a broadcast-joined frame
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom gate missing from plan:\n$plan")
    // selectivity: survivors ≈ true overlap, a sliver of all shingles
    val total = hs.filter(col("doc_id") % 97 =!= 0)
      .select(explode(col("hs"))).count()
    val survivors = gated.agg(sum(col("n_overlap"))).head().getLong(0)
    assert(survivors * 10 < total,
      s"prefilter should kill the bulk: $survivors survivors of $total shingles")
  }
}
