package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mapping-driven metadata extraction from semi-structured files — the
  * JSON and XML extractors of the reference's per-file extractor suite
  * (tests/test_extractors.py:152-256 `test_json` and :268-338
  * `test_xml`).
  *
  * Semantics pinned by the reference tests:
  *  - a mapping assigns each OUTPUT dotted path a SOURCE dotted path
  *    into the document (`"custom.foo" -> "dict1.field1"`); the
  *    reference accepts the mapping either as a nested dict or as flat
  *    dotted keys — both forms are equivalent ([[flattenMapping]]
  *    canonicalizes the nested form, property-pinned in spec);
  *  - source paths that do not resolve are OMITTED from the record
  *    (null column here), not errors;
  *  - values listed in `na_values` are dropped as if unmapped;
  *  - JSON scalars keep their type (the reference record has
  *    `"bar": True`); XML values are always strings (`"bar": 'true'`);
  *  - a file with no parsable payload yields an empty record
  *    (all-null row, success=false).
  *
  * Shape: one narrow projection per file — `get_json_object` /
  * `xpath_string` are row-local codegen'd expressions, so the extractor
  * is a pure map stage with no shuffle and runs over billions of
  * feedstock files unchanged. The XML parse is guarded by a cheap
  * prolog test because `xpath_string` THROWS on malformed XML (verified
  * against Spark 4.1 — `UDFXPathUtil.eval` rethrows the SAX error);
  * conditional branches evaluate lazily per row, so invalid payloads
  * never reach the parser.
  */
object MappingExtractOps {

  /** Canonicalize the reference's nested-dict mapping form to flat
    * dotted (output, source) pairs — `{"custom": {"foo": "dict1.field1"}}`
    * and `{"custom.foo": "dict1.field1"}` are the same mapping
    * (test_extractors.py:171-186, mapping1 vs mapping2). Sorted by
    * output path so column order is deterministic regardless of map
    * iteration order. */
  def flattenMapping(nested: Map[String, Any]): Seq[(String, String)] = {
    def walk(prefix: String, m: Map[String, Any]): Seq[(String, String)] =
      m.toSeq.flatMap {
        case (k, v: String) => Seq((if (prefix.isEmpty) k else s"$prefix.$k") -> v)
        case (k, v: Map[_, _]) =>
          walk(if (prefix.isEmpty) k else s"$prefix.$k",
            v.asInstanceOf[Map[String, Any]])
        case (k, v) =>
          throw new IllegalArgumentException(s"mapping value for '$k' must be String or Map, got $v")
      }
    walk("", nested).sortBy(_._1)
  }

  // ------------------------------------------------------------- JSON

  /** The reference test's mapping (test_extractors.py:181-186), flat
    * form, with `.`→`_` in output names (parquet column names cannot
    * contain dots). */
  val jsonMapping: Seq[(String, String)] = Seq(
    "custom_bar" -> "dict2.nested1.field1",
    "custom_foo" -> "dict1.field1",
    "custom_missing" -> "na_val",
    "material_composition" -> "compost")

  val jsonNaValues: Seq[String] = Seq("na")

  /** Deterministic JSON payload per document mirroring the reference
    * test document (test_extractors.py:153-166): nested dicts, an
    * unmapped field, an na-valued field. Planted variations: every 13th
    * file carries no parsable data; every 11th omits
    * `dict2.nested1.field1` (missing-source-path branch); every 5th
    * holds the na sentinel. `to_json` omits null struct fields, which
    * is exactly the "path absent" case. */
  def jsonFiles(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val payload = when(id % 13 === 0, lit("no structured data here"))
      .otherwise(to_json(struct(
        struct(
          concat(lit("value"), (id % 7).cast("string")).as("field1"),
          (id % 10).cast("int").as("field2")).as("dict1"),
        struct(struct(
          when(id % 11 =!= 0, id % 2 === 0).as("field1"),
          lit("value3").as("field3")).as("nested1")).as("dict2"),
        concat(lit("CN"), (id % 50).cast("string")).as("compost"),
        when(id % 5 === 0, lit("na"))
          .otherwise(concat(lit("v"), (id % 5).cast("string"))).as("na_val"))))
    Tables.documents(s, dir).select(col("doc_id"), payload.as("payload"))
  }

  /** Generic mapping-driven JSON extraction: one `get_json_object` per
    * mapped field (row-local, codegen'd), na values dropped to null,
    * `booleanFields` cast back to their JSON type (the reference
    * preserves scalar types; a tabular record needs the column typed).
    * Invalid JSON (root probe returns null) yields the empty record. */
  def jsonMappingExtractOf(files: DataFrame, idCol: String, payloadCol: String,
      mapping: Seq[(String, String)], naValues: Seq[String],
      booleanFields: Set[String] = Set.empty): DataFrame = {
    val p = col(payloadCol)
    val valid = get_json_object(p, "$").isNotNull
    val cols = mapping.map { case (out, src) =>
      val raw = get_json_object(p, "$." + src)
      val kept =
        if (naValues.isEmpty) raw
        else when(!raw.isin(naValues.map(lit): _*), raw)
      (if (booleanFields(out)) kept.cast("boolean") else kept).as(out)
    }
    files.select(col(idCol) +: cols :+ valid.as("success"): _*)
  }

  def jsonMappingExtract(s: SparkSession, dir: String): DataFrame =
    jsonMappingExtractOf(jsonFiles(s, dir), "doc_id", "payload",
      jsonMapping, jsonNaValues, booleanFields = Set("custom_bar"))
      .orderBy("doc_id")

  /** The oracle rebuilds the JSON by string concatenation (not DuckDB's
    * serializer) and extracts with `json_extract_string` — an
    * independent parse path over byte-identical documents. All json_*
    * calls are guarded by json_valid: DuckDB's extractors ERROR on
    * malformed input rather than returning null. */
  val jsonMappingExtractSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN 'no structured data here'
      |    ELSE '{"dict1":{"field1":"value' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '","field2":' || CAST(doc_id % 10 AS VARCHAR) || '},"dict2":{"nested1":{' ||
      |      CASE WHEN doc_id % 11 <> 0
      |           THEN '"field1":' || (CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END) || ','
      |           ELSE '' END ||
      |      '"field3":"value3"}},"compost":"CN' || CAST(doc_id % 50 AS VARCHAR) ||
      |      '","na_val":"' ||
      |      (CASE WHEN doc_id % 5 = 0 THEN 'na' ELSE 'v' || CAST(doc_id % 5 AS VARCHAR) END) ||
      |      '"}'
      |    END AS payload
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN json_valid(payload)
      |       THEN CAST(json_extract_string(payload, '$.dict2.nested1.field1') AS BOOLEAN) END
      |    AS custom_bar,
      |  CASE WHEN json_valid(payload)
      |       THEN json_extract_string(payload, '$.dict1.field1') END AS custom_foo,
      |  CASE WHEN json_valid(payload)
      |        AND json_extract_string(payload, '$.na_val') NOT IN ('na')
      |       THEN json_extract_string(payload, '$.na_val') END AS custom_missing,
      |  CASE WHEN json_valid(payload)
      |       THEN json_extract_string(payload, '$.compost') END AS material_composition,
      |  json_valid(payload) AS success
      |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- XML

  /** The reference XML test's mapping (test_extractors.py:276-287) —
    * source paths include the document root element. */
  val xmlMapping: Seq[(String, String)] = Seq(
    "custom_bar" -> "root.dict2.nested1.field1",
    "custom_foo" -> "root.dict1.field1",
    "material_composition" -> "root.compost")

  /** Deterministic XML payload per document mirroring the reference
    * test document (test_extractors.py:268-271), same planted
    * variations as [[jsonFiles]]. Boolean-looking values stay strings —
    * the reference record expects `'true'`, not `True`. */
  def xmlFiles(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val payload = when(id % 13 === 0, lit("no structured data here"))
      .otherwise(concat(
        lit("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<root><dict1><field1>value"),
        (id % 7).cast("string"),
        lit("</field1><field2>"), (id % 10).cast("string"),
        lit("</field2></dict1><dict2><nested1>"),
        when(id % 11 =!= 0,
          concat(lit("<field1>"), (id % 2 === 0).cast("string"), lit("</field1>")))
          .otherwise(lit("")),
        lit("<field3>value3</field3></nested1></dict2><compost>CN"),
        (id % 50).cast("string"),
        lit("</compost></root>")))
    Tables.documents(s, dir).select(col("doc_id"), payload.as("payload"))
  }

  /** Generic mapping-driven XML extraction: dotted source path →
    * absolute XPath, one `xpath_string` per mapped field. The prolog
    * guard is mandatory (xpath_string throws on malformed XML);
    * `nullif(…, '')` turns XPath's empty-string "no match" into the
    * omitted-field null. */
  def xmlMappingExtractOf(files: DataFrame, idCol: String, payloadCol: String,
      mapping: Seq[(String, String)]): DataFrame = {
    val p = col(payloadCol)
    val valid = p.startsWith("<?xml")
    val cols = mapping.map { case (out, src) =>
      when(valid, nullif(xpath_string(p, lit("/" + src.replace('.', '/'))), lit("")))
        .as(out)
    }
    files.select(col(idCol) +: cols :+ valid.as("success"): _*)
  }

  def xmlMappingExtract(s: SparkSession, dir: String): DataFrame =
    xmlMappingExtractOf(xmlFiles(s, dir), "doc_id", "payload", xmlMapping)
      .orderBy("doc_id")

  /** DuckDB has no XML reader, so the oracle extracts with regexes
    * anchored on the full enclosing-tag context of each mapped path —
    * an independent derivation that agrees with a real XML parse on
    * these (attribute-free, unambiguous) documents. */
  val xmlMappingExtractSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN 'no structured data here'
      |    ELSE '<?xml version="1.0" encoding="utf-8"?>' || chr(10) ||
      |      '<root><dict1><field1>value' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '</field1><field2>' || CAST(doc_id % 10 AS VARCHAR) ||
      |      '</field2></dict1><dict2><nested1>' ||
      |      CASE WHEN doc_id % 11 <> 0
      |           THEN '<field1>' || (CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END) || '</field1>'
      |           ELSE '' END ||
      |      '<field3>value3</field3></nested1></dict2><compost>CN' ||
      |      CAST(doc_id % 50 AS VARCHAR) || '</compost></root>'
      |    END AS payload
      |  FROM documents)
      |SELECT doc_id,
      |  nullif(regexp_extract(payload, '<nested1><field1>([^<]*)</field1>', 1), '') AS custom_bar,
      |  nullif(regexp_extract(payload, '<dict1><field1>([^<]*)</field1>', 1), '') AS custom_foo,
      |  nullif(regexp_extract(payload, '<compost>([^<]*)</compost>', 1), '') AS material_composition,
      |  payload LIKE '<?xml%' AS success
      |FROM f ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_mapping_extract" -> (jsonMappingExtract _),
    "q_xml_mapping_extract" -> (xmlMappingExtract _))

  def oracles: Map[String, String] = Map(
    "q_json_mapping_extract" -> jsonMappingExtractSql,
    "q_xml_mapping_extract" -> xmlMappingExtractSql)
}
