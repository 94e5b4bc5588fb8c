package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Encoding-cleanliness scoring — the "is this even valid text" gate a
  * crawl pipeline runs before any language or quality model sees a
  * byte (Gopher/RefinedWeb drop documents with encoding damage;
  * CCNet's fasttext stage implicitly does the same because mojibake
  * scores as no-language). Three independent damage signals plus an
  * ASCII-share summary, all computed in ONE codegen string projection
  * per document — no shuffle, scan speed at crawl scale:
  *
  *  - `n_replacement`: U+FFFD replacement characters — a decoder
  *    already gave up upstream;
  *  - `n_control`: C0/C1 control characters outside whitespace
  *    (\x00-\x08, \x0E-\x1F, \x7F-\x9F) — binary-in-text or a
  *    mislabeled single-byte charset (VT is absent by construction:
  *    the loader seam normalizes it, see Tables.documents);
  *  - `n_mojibake`: the classic UTF-8-read-as-Latin-1 digraphs — Ã or
  *    Â followed by a continuation-range character (U+0080-U+00BF),
  *    the display form of every double-encoded U+00C0..U+00FF letter
  *    (e.g. é → "Ã©", « → "Â«");
  *  - `ascii_ppm`: printable-ASCII(+tab/newline) share as exact
  *    integer ppm (floor division — no FP anywhere in the row, the
  *    [[DedupOps.dupProfile]] discipline);
  *  - `flagged`: any damage signal non-zero, the drop verdict.
  *
  * The driver corpus is clean ASCII, so damage is planted
  * deterministically from doc_id (the [[graft.functions.TextFunctions
  * .piiScrub]] fixture pattern) — identically in the Spark plan and
  * the DuckDB oracle, which therefore hash-checks detector semantics,
  * not fixture luck.
  */
object EncodingOps {

  /** Mojibake class: Ã/Â then a continuation-range char. Built from
    * literal BMP chars so the Java and RE2 engines read the identical
    * class. */
  private val mojibakeRe = "[\u00C3\u00C2][\u0080-\u00BF]"
  private val controlRe = "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]"
  private val nonAsciiRe = "[^\\x20-\\x7E\\t\\n\\r]"

  /** Deterministic damage: a mojibake pair (docs ≡0 mod 5), a
    * replacement char (mod 7), a bell control char (mod 11). */
  private def plantedCol: Column = concat(col("text"),
    when(col("doc_id") % 5 === 0, lit(" caf\u00C3\u00A9 na\u00C3\u00AFve"))
      .otherwise(lit("")),
    when(col("doc_id") % 7 === 0, lit(" bad\uFFFDchar")).otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit(" ctl\u0007")).otherwise(lit("")))

  def encodingQuality(s: SparkSession, dir: String): DataFrame =
    encodingQualityOf(
      Tables.documents(s, dir).withColumn("raw", plantedCol),
      col("doc_id"), col("raw"))
      .orderBy("doc_id")

  /** Generic API \u2014 score ANY text frame for encoding damage (the plant
    * above is a test fixture, not part of the detector). Emits the
    * three damage counters, the exact-integer ascii_ppm, and the drop
    * verdict, keyed by `id`. One codegen string projection, scan speed
    * on any corpus. */
  def encodingQualityOf(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
        id,
        size(regexp_extract_all(text, lit("\uFFFD"), lit(0)))
          .as("n_replacement"),
        size(regexp_extract_all(text, lit(controlRe), lit(0)))
          .as("n_control"),
        size(regexp_extract_all(text, lit(mojibakeRe), lit(0)))
          .as("n_mojibake"),
        ((length(text).cast("long") -
          size(regexp_extract_all(text, lit(nonAsciiRe), lit(0))).cast("long"))
          * lit(1000000L)).as("a"),
        length(text).cast("long").as("raw_len"))
      .withColumn("ascii_ppm", expr("a div greatest(raw_len, 1)"))
      .withColumn("flagged",
        col("n_replacement") > 0 || col("n_control") > 0 || col("n_mojibake") > 0)
      .drop("a", "raw_len")

  /** Oracle: identical plant + identical classes; non-ASCII regex
    * chars enter via chr() so the SQL text stays 7-bit clean. */
  val encodingQualitySql: String =
    """WITH raw AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 5 = 0 THEN ' caf' || chr(195) || chr(169) ||
      |      ' na' || chr(195) || chr(175) || 've' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0 THEN ' bad' || chr(65533) || 'char' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ' ctl' || chr(7) ELSE '' END AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, chr(65533))) AS INTEGER) AS n_replacement,
      |  CAST(len(regexp_extract_all(raw,
      |    '[\x{00}-\x{08}\x{0E}-\x{1F}\x{7F}-\x{9F}]')) AS INTEGER) AS n_control,
      |  CAST(len(regexp_extract_all(raw,
      |    '[' || chr(195) || chr(194) || '][\x{80}-\x{BF}]')) AS INTEGER) AS n_mojibake,
      |  (length(raw) - len(regexp_extract_all(raw, '[^\x{20}-\x{7E}\t\n\r]')))
      |    * 1000000 // greatest(length(raw), 1) AS ascii_ppm,
      |  (len(regexp_extract_all(raw, chr(65533))) > 0 OR
      |   len(regexp_extract_all(raw, '[\x{00}-\x{08}\x{0E}-\x{1F}\x{7F}-\x{9F}]')) > 0 OR
      |   len(regexp_extract_all(raw,
      |     '[' || chr(195) || chr(194) || '][\x{80}-\x{BF}]')) > 0) AS flagged
      |FROM raw ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_encoding_quality" -> (encodingQuality _))

  def oracles: Map[String, String] = Map(
    "q_encoding_quality" -> encodingQualitySql)
}
