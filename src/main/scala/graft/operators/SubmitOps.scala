package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Submission intake semantics.
  *
  * Reference: `aws/submit.py:100-190` — parse the submission JSON, inject
  * defaults (`dc.resourceType` = Dataset), move top-level `tags` into
  * `dc.subjects`, reject NaN/Infinity, and pull configuration fields out
  * of the metadata; `tests/test_validator.py` — validate required fields
  * per record and report the reasons.
  *
  * The Spark side round-trips real JSON (`to_json`/`from_json` with an
  * explicit schema) so the operator covers schema-on-read of nested
  * submission documents, not just column math; the oracle reproduces the
  * net semantics from the same base columns.
  */
object SubmitOps {

  private val submissionSchema = StructType(Seq(
    StructField("dc", StructType(Seq(
      StructField("titles", ArrayType(StructType(Seq(StructField("title", StringType))))),
      StructField("resourceType", StructType(Seq(
        StructField("resourceTypeGeneral", StringType)))),
      StructField("subjects", ArrayType(StructType(Seq(StructField("subject", StringType)))))))),
    StructField("tags", ArrayType(StringType)),
    StructField("test", BooleanType),
    StructField("update", BooleanType),
    StructField("value", DoubleType)))

  /** Deterministic raw submission JSON per document: every 3rd has tags,
    * every 4th pre-sets resourceType, every 5th is a test submission. */
  def rawSubmissions(s: SparkSession, dir: String): DataFrame = {
    val title = array_join(slice(split(col("text"), " "), 1, 4), " ")
    Tables.documents(s, dir).select(
      col("doc_id"),
      to_json(struct(
        struct(
          array(struct(title.as("title"))).as("titles"),
          when(col("doc_id") % 4 === 0,
            struct(lit("Software").as("resourceTypeGeneral"))).as("resourceType"),
          when(col("doc_id") % 6 === 0,
            array(struct(lit("materials").as("subject")))).as("subjects")).as("dc"),
        when(col("doc_id") % 3 === 0, array(lit("oxide"), col("source"))).as("tags"),
        (col("doc_id") % 5 === 0).as("test"),
        lit(false).as("update"),
        (col("doc_id") % 100).cast("double").as("value"))).as("raw_json"))
  }

  /** Normalization: defaults + tags→subjects move, flattened output. */
  def submissionNormalize(s: SparkSession, dir: String): DataFrame = {
    val parsed = rawSubmissions(s, dir)
      .withColumn("sub", from_json(col("raw_json"), submissionSchema))
    parsed.select(
      col("doc_id"),
      col("sub.dc.titles").getItem(0).getField("title").as("title"),
      // resourceType defaults to Dataset when absent (submit.py:141-149)
      coalesce(col("sub.dc.resourceType.resourceTypeGeneral"), lit("Dataset"))
        .as("resource_type"),
      // tags move into dc.subjects (submit.py:152-162)
      (coalesce(size(col("sub.dc.subjects")), lit(0)) +
        coalesce(size(col("sub.tags")), lit(0))).as("n_subjects"),
      coalesce(col("sub.test"), lit(false)).as("is_test"),
      col("sub.value").as("value"))
      .orderBy("doc_id")
  }

  val submissionNormalizeSql: String =
    """SELECT doc_id,
      |  array_to_string((string_split(text, ' '))[1:4], ' ') AS title,
      |  CASE WHEN doc_id % 4 = 0 THEN 'Software' ELSE 'Dataset' END AS resource_type,
      |  CAST((CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END) AS INTEGER) AS n_subjects,
      |  doc_id % 5 = 0 AS is_test,
      |  CAST(doc_id % 100 AS DOUBLE) AS value
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-record validation with error reasons (validator semantics):
    * title must be non-empty, value within [0, 50), test submissions may
    * not also be updates, and numeric fields may not be NaN/±Infinity
    * (submit.py:102-111 — `json.dumps(..., allow_nan=False)` rejects the
    * whole submission; both engines order NaN above all doubles, so the
    * range rule stays consistent too) — invalid rows report every failed
    * rule. */
  def validateSubmission(s: SparkSession, dir: String): DataFrame = {
    val base = submissionNormalize(s, dir)
      .withColumn("title", when(col("doc_id") % 7 === 0, lit("")).otherwise(col("title")))
      .withColumn("value",
        when(col("doc_id") % 23 === 0, lit(Double.NaN))
          .when(col("doc_id") % 29 === 0, lit(Double.PositiveInfinity))
          .otherwise(col("value")))
    val errs = array(
      when(length(col("title")) === 0, lit("title: empty")),
      when(col("value") >= 50, lit("value: out of range")),
      when(col("is_test") && col("resource_type") === "Software", lit("test: software not allowed")),
      when(isnan(col("value")) || abs(col("value")) === lit(Double.PositiveInfinity),
        lit("value: NaN or Infinity not allowed")))
    base.select(
      col("doc_id"),
      filter(errs, e => e.isNotNull).as("errs"))
      .select(
        col("doc_id"),
        (size(col("errs")) === 0).as("is_valid"),
        concat_ws("; ", col("errs")).as("errors"))
      .orderBy("doc_id")
  }

  val validateSubmissionSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'x' END AS title_probe,
      |    CASE WHEN doc_id % 23 = 0 THEN 'NaN'::DOUBLE
      |         WHEN doc_id % 29 = 0 THEN 'Infinity'::DOUBLE
      |         ELSE CAST(doc_id % 100 AS DOUBLE) END AS value,
      |    doc_id % 5 = 0 AS is_test,
      |    CASE WHEN doc_id % 4 = 0 THEN 'Software' ELSE 'Dataset' END AS resource_type
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, list_filter([
      |    CASE WHEN title_probe = '' THEN 'title: empty' END,
      |    CASE WHEN value >= 50 THEN 'value: out of range' END,
      |    CASE WHEN is_test AND resource_type = 'Software' THEN 'test: software not allowed' END,
      |    CASE WHEN isnan(value) OR isinf(value) THEN 'value: NaN or Infinity not allowed' END],
      |    x -> x IS NOT NULL) AS errs
      |  FROM b)
      |SELECT doc_id, len(errs) = 0 AS is_valid,
      |  coalesce(array_to_string(errs, '; '), '') AS errors
      |FROM e ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ dataset entries

  private val datasetSchema = StructType(Seq(
    StructField("dc", StructType(Seq(
      StructField("creators", ArrayType(StructType(Seq(
        StructField("creatorName", StringType),
        StructField("familyName", StringType),
        StructField("givenName", StringType))))),
      StructField("publicationYear", StringType),
      StructField("publisher", StringType),
      StructField("resourceType", StructType(Seq(
        StructField("resourceType", StringType),
        StructField("resourceTypeGeneral", StringType)))),
      StructField("titles", ArrayType(StructType(Seq(StructField("title", StringType)))))))),
    StructField("mdf", StructType(Seq(
      StructField("source_name", StringType),
      StructField("source_id", StringType),
      StructField("acl", ArrayType(StringType)))))))

  /** Deterministic full dataset-entry JSON per document, with planted
    * schema defects: missing titles (every 7th), empty creators (11th),
    * missing publicationYear (13th), empty acl (19th), a source_id that
    * does not extend source_name (23rd). */
  def rawDatasets(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sourceName = concat(lit("ds_"), col("source"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      to_json(struct(
        struct(
          when(id % 11 =!= 0, array(struct(
            lit("Footon, Bartholomew").as("creatorName"),
            lit("Footon").as("familyName"),
            lit("Bartholomew").as("givenName")))).as("creators"),
          when(id % 13 =!= 0, lit("2018")).as("publicationYear"),
          lit("Materials Data Facility").as("publisher"),
          struct(lit("Dataset").as("resourceType"),
            lit("Dataset").as("resourceTypeGeneral")).as("resourceType"),
          when(id % 7 =!= 0,
            array(struct(array_join(slice(split(col("text"), " "), 1, 3), " ").as("title"))))
            .as("titles")).as("dc"),
        struct(
          sourceName.as("source_name"),
          when(id % 23 === 0, lit("other_v1"))
            .otherwise(concat(sourceName, lit("_v"), (id % 3 + 1).cast("string")))
            .as("source_id"),
          when(id % 19 =!= 0, array(lit("public"))).as("acl")).as("mdf"))).as("raw_json"))
  }

  /** Dataset-entry schema validation (tests/test_validator.py): required
    * dc/mdf blocks checked after a real JSON round-trip, every violated
    * requirement reported — the reference's jsonschema error surface as
    * a per-record column. */
  def validateDataset(s: SparkSession, dir: String): DataFrame = {
    val d = rawDatasets(s, dir)
      .withColumn("e", from_json(col("raw_json"), datasetSchema))
    val errs = array(
      when(coalesce(size(col("e.dc.titles")), lit(0)) === 0, lit("dc.titles: required")),
      when(coalesce(size(col("e.dc.creators")), lit(0)) === 0, lit("dc.creators: required")),
      when(col("e.dc.publicationYear").isNull, lit("dc.publicationYear: required")),
      when(coalesce(size(col("e.mdf.acl")), lit(0)) === 0, lit("mdf.acl: required")),
      when(!col("e.mdf.source_id").startsWith(concat(col("e.mdf.source_name"), lit("_v"))),
        lit("mdf.source_id: must extend source_name")))
    d.select(col("doc_id"), filter(errs, e => e.isNotNull).as("errs"))
      .select(
        col("doc_id"),
        (size(col("errs")) === 0).as("is_valid"),
        concat_ws("; ", col("errs")).as("errors"))
      .orderBy("doc_id")
  }

  val validateDatasetSql: String =
    """WITH e AS (
      |  SELECT doc_id, list_filter([
      |    CASE WHEN doc_id % 7 = 0 THEN 'dc.titles: required' END,
      |    CASE WHEN doc_id % 11 = 0 THEN 'dc.creators: required' END,
      |    CASE WHEN doc_id % 13 = 0 THEN 'dc.publicationYear: required' END,
      |    CASE WHEN doc_id % 19 = 0 THEN 'mdf.acl: required' END,
      |    CASE WHEN doc_id % 23 = 0 THEN 'mdf.source_id: must extend source_name' END],
      |    x -> x IS NOT NULL) AS errs
      |  FROM documents)
      |SELECT doc_id, len(errs) = 0 AS is_valid,
      |  coalesce(array_to_string(errs, '; '), '') AS errors
      |FROM e ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_submission_normalize" -> (submissionNormalize _),
    "q_validate_submission"  -> (validateSubmission _),
    "q_validate_dataset"     -> (validateDataset _))

  def oracles: Map[String, String] = Map(
    "q_submission_normalize" -> submissionNormalizeSql,
    "q_validate_submission"  -> validateSubmissionSql,
    "q_validate_dataset"     -> validateDatasetSql)
}
