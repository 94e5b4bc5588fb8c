package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: deterministic splits, weighted corpus mixing,
  * per-domain quotas, sequence packing, and benchmark-contamination
  * detection.
  *
  * Everything here is keyed on content hashes (md5 hex), never on RNG:
  * the same corpus always yields the same split/sample/pack, runs are
  * reproducible across engines and cluster sizes, and the DuckDB oracle
  * can replay each operator exactly. All operators are map-side column
  * chains or single-shuffle windows/aggregations — no driver actions, no
  * all-pairs joins — so each plan holds unchanged at 100 TB.
  */
object PipelineOps {

  /** Stable per-document sampling key: md5 over (source, doc_id). Using
    * the hex string (not a parsed int) keeps the comparison identical in
    * every engine — lowercase hex compares lexicographically in key
    * order. */
  private def sampleKey = md5(concat_ws("#", col("source"), col("doc_id").cast("string")))

  private val sampleKeySql = "md5(source || '#' || CAST(doc_id AS VARCHAR))"

  // ------------------------------------------------------ hash split

  /** Deterministic train/val/test assignment by the first hex digit of
    * the content hash: 12/16 train, 2/16 val, 2/16 test. Pure map-side
    * column chain — a 100 TB corpus splits with zero shuffles, and a doc
    * keeps its split across reruns and engine versions. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", substring(sampleKey, 1, 1))
      .select(col("doc_id"), col("source"), col("bucket"),
        when(col("bucket") <= "b", "train")
          .when(col("bucket") <= "d", "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")

  val hashSplitSql: String =
    s"""SELECT doc_id, source, bucket,
       |  CASE WHEN bucket <= 'b' THEN 'train'
       |       WHEN bucket <= 'd' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, source,
       |        substring($sampleKeySql, 1, 1) AS bucket
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ corpus mix

  /** Per-tier sampling rates for the mixture: tier = source number mod 4.
    * Rate 1.0 keeps everything; lower tiers are downsampled by comparing
    * a 16-bit slice of the content hash against the rate's hex threshold
    * (floor(rate * 0x10000)). `weight` is the inverse rate, so weighted
    * counts over the sample are unbiased estimates of the full corpus. */
  private val tierRates = Seq(
    // (tier, hex threshold, inverse-propensity weight)
    (0, "ffff", 1.0), // rate 1.0 — threshold unused, kept for symmetry
    (1, "8000", 2.0), // rate 0.5
    (2, "4000", 4.0), // rate 0.25
    (3, "1999", 10.0)) // rate 0.1

  /** Weighted corpus mixing: downsample each source tier at its
    * configured rate, deterministically. The rate lookup is a literal
    * CASE (at production scale, a broadcast-joined config dim); the
    * keep/drop decision is a map-side hash compare, so mixing a 100 TB
    * corpus is a single scan with no shuffle at all. */
  def corpusMix(s: SparkSession, dir: String): DataFrame = {
    val tier = substring(col("source"), 4, 10).cast("int") % 4
    val thr = tierRates.tail.foldLeft(lit(tierRates.head._2)) { case (acc, (t, h, _)) =>
      when(tier === t, lit(h)).otherwise(acc)
    }
    val weight = tierRates.tail.foldLeft(lit(tierRates.head._3)) { case (acc, (t, _, w)) =>
      when(tier === t, lit(w)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .withColumn("tier", tier)
      .withColumn("sample_key", substring(sampleKey, 1, 4))
      .filter(col("tier") === 0 || col("sample_key") < thr)
      .select(col("doc_id"), col("source"), col("tier"), col("sample_key"),
        weight.as("weight"))
      .orderBy("doc_id")
  }

  val corpusMixSql: String = {
    val thrCase = tierRates.tail.map { case (t, h, _) => s"WHEN tier = $t THEN '$h'" }
      .mkString(" ")
    val wCase = tierRates.tail.map { case (t, _, w) => s"WHEN tier = $t THEN $w" }
      .mkString(" ")
    s"""SELECT doc_id, source, tier, sample_key,
       |  CAST(CASE $wCase ELSE ${tierRates.head._3} END AS DOUBLE) AS weight
       |FROM (SELECT doc_id, source,
       |        CAST(substring(source, 4) AS INTEGER) % 4 AS tier,
       |        substring($sampleKeySql, 1, 4) AS sample_key
       |      FROM documents)
       |WHERE tier = 0 OR sample_key < CASE $thrCase ELSE '${tierRates.head._2}' END
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ domain cap

  val domainCap = 15

  /** Per-domain quota: keep at most `domainCap` documents per source,
    * chosen by the stable content hash (a deterministic uniform sample,
    * not "first N by id" which would bias toward old crawls). One
    * shuffle partitioned by source; Spark's WindowGroupLimit pushes the
    * rank bound map-side, so each partition forwards at most
    * `domainCap` rows per source into the shuffle — a viral domain with
    * 100M pages costs its per-input-split top-15, not a 100M-row sort. */
  def domainCapped(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(sampleKey, col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= domainCap)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")
  }

  val domainCapSql: String =
    s"""SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY $sampleKeySql, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $domainCap ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ packing

  val packBudget = 512

  /** Sequence packing, concat-and-chunk style: per source, documents are
    * concatenated in doc_id order into a token stream that is cut into
    * `packBudget`-token context windows; each document learns which pack
    * it starts in and at what offset. One window shuffle partitioned by
    * source — the running sum is O(1) state per partition, so packing a
    * 100 TB corpus is one pass (per-source streams pack independently,
    * which is also what keeps pack contents deterministic under
    * re-partitioning). */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("cum_before") / packBudget).as("pack_id"),
        (col("cum_before") % packBudget).as("pack_offset"))
      .orderBy("doc_id")
  }

  val packSequencesSql: String =
    s"""SELECT doc_id, source,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
       |  CAST(floor(cum_before / $packBudget.0) AS BIGINT) AS pack_id,
       |  CAST(cum_before % $packBudget AS BIGINT) AS pack_offset
       |FROM (
       |  SELECT doc_id, source, text,
       |    CAST(coalesce(sum(len(string_split_regex(trim(text), '\\s+')))
       |      OVER (PARTITION BY source ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ contamination

  val contaminationFrac = 0.05

  /** Benchmark-contamination check: flag training documents whose
    * word-3-gram shingles overlap an eval set beyond a threshold — the
    * standard decontamination gate before pre-training. The eval set
    * here is the deterministic doc_id % 97 subset; in production it is
    * the benchmark suite, which is always tiny relative to the corpus,
    * so its distinct shingle hashes broadcast and the whole check is a
    * map-side probe plus one groupBy on doc_id. Nothing scales with
    * corpus × benchmark size. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.shingles(s, dir)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(transform(col("sh"), x => xxhash64(x))).as("h"))
      .distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(transform(col("sh"), x => xxhash64(x))).as("h"))
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(coalesce(sum(col("hit")), lit(0)).cast("long").as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_shingles")).as("overlap_frac"),
        (col("n_overlap").cast("double") / col("n_shingles") > contaminationFrac)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  /** Oracle intersects the shingle *strings* — identical to the hashed
    * plan up to 64-bit collisions (~1e-9 at test vocabulary sizes). */
  val contaminationSql: String = DedupOps.shinglesSql +
    s""", bl AS (
       |  SELECT list(s) AS bl FROM (
       |    SELECT DISTINCT unnest(sh) AS s FROM sh_t WHERE doc_id % 97 = 0))
       |SELECT doc_id,
       |  CAST(len(sh) AS INTEGER) AS n_shingles,
       |  CAST(len(list_intersect(sh, bl)) AS BIGINT) AS n_overlap,
       |  CAST(len(list_intersect(sh, bl)) AS DOUBLE) / len(sh) AS overlap_frac,
       |  (CAST(len(list_intersect(sh, bl)) AS DOUBLE) / len(sh)) > $contaminationFrac
       |    AS contaminated
       |FROM sh_t CROSS JOIN bl
       |WHERE doc_id % 97 <> 0
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hash_split"     -> (hashSplit _),
    "q_corpus_mix"     -> (corpusMix _),
    "q_domain_cap"     -> (domainCapped _),
    "q_pack_sequences" -> (packSequences _),
    "q_contamination"  -> (contamination _))

  def oracles: Map[String, String] = Map(
    "q_hash_split"     -> hashSplitSql,
    "q_corpus_mix"     -> corpusMixSql,
    "q_domain_cap"     -> domainCapSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_contamination"  -> contaminationSql)
}
