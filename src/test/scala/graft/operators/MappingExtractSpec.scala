package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Pins the mapping extractors to the reference's own test vectors
  * (tests/test_extractors.py:test_json :152-256, test_xml :268-338). */
class MappingExtractSpec extends SparkSpec {
  import spark.implicits._

  // The reference test document, verbatim (test_extractors.py:153-166).
  private val refJson =
    """{"dict1": {"field1": "value1", "field2": 2},
      | "dict2": {"nested1": {"field1": true, "field3": "value3"}},
      | "compost": "CN25", "na_val": "na"}""".stripMargin

  private val refXml =
    "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
      "<root><dict1><field1>value1</field1><field2>2</field2></dict1>" +
      "<dict2><nested1><field1>true</field1><field3>value3</field3></nested1></dict2>" +
      "<compost>CN25</compost></root>"

  test("nested mapping form flattens to the flat dotted form (mapping1 == mapping2)") {
    val mapping1 = Map(
      "custom" -> Map(
        "foo" -> "dict1.field1",
        "bar" -> "dict2.nested1.field1",
        "missing" -> "na_val"),
      "material" -> Map("composition" -> "compost"))
    val mapping2 = Seq(
      "custom.bar" -> "dict2.nested1.field1",
      "custom.foo" -> "dict1.field1",
      "custom.missing" -> "na_val",
      "material.composition" -> "compost")
    assert(MappingExtractOps.flattenMapping(mapping1) === mapping2)
  }

  test("json extraction matches correct_record: na dropped, types preserved") {
    val files = Seq((1L, refJson)).toDF("doc_id", "payload")
    val out = MappingExtractOps.jsonMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.jsonMapping, MappingExtractOps.jsonNaValues,
      booleanFields = Set("custom_bar")).collect()
    // correct_record: foo=value1, bar=True (boolean), composition=CN25,
    // missing OMITTED because "na" is an na_value
    assert(out === Array(Row(1L, true, "value1", null, "CN25", true)))
  }

  test("json extraction keeps the na value when na_values is empty (with_na_record)") {
    val files = Seq((1L, refJson)).toDF("doc_id", "payload")
    val out = MappingExtractOps.jsonMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.jsonMapping, naValues = Nil,
      booleanFields = Set("custom_bar")).collect()
    assert(out === Array(Row(1L, true, "value1", "na", "CN25", true)))
  }

  test("json failure mode: unparsable file yields the empty record") {
    val files = Seq((1L, "no data here")).toDF("doc_id", "payload")
    val out = MappingExtractOps.jsonMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.jsonMapping, MappingExtractOps.jsonNaValues).collect()
    assert(out === Array(Row(1L, null, null, null, null, false)))
  }

  test("json: unresolvable source path is omitted, not an error") {
    val files = Seq((1L, """{"dict1": {"field1": "v"}}""")).toDF("doc_id", "payload")
    val out = MappingExtractOps.jsonMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.jsonMapping, MappingExtractOps.jsonNaValues).collect()
    assert(out === Array(Row(1L, null, "v", null, null, true)))
  }

  test("xml extraction matches correct_record: values stay strings") {
    val files = Seq((1L, refXml)).toDF("doc_id", "payload")
    val out = MappingExtractOps.xmlMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.xmlMapping).collect()
    // correct_record: bar='true' the STRING — XML has no scalar types
    assert(out === Array(Row(1L, "true", "value1", "CN25", true)))
  }

  test("xml failure mode: malformed file yields the empty record (no throw)") {
    val files = Seq((1L, "not xml"), (2L, refXml)).toDF("doc_id", "payload")
    val out = MappingExtractOps.xmlMappingExtractOf(files, "doc_id", "payload",
      MappingExtractOps.xmlMapping).orderBy("doc_id").collect()
    assert(out(0) === Row(1L, null, null, null, false))
    assert(out(1)(4) === true)
  }

  test("full queries run on testdata and agree on planted variations") {
    val j = MappingExtractOps.jsonMappingExtract(spark, sfDir).collect()
    val x = MappingExtractOps.xmlMappingExtract(spark, sfDir).collect()
    assert(j.length === x.length)
    j.zip(x).foreach { case (jr, xr) =>
      val id = jr.getLong(0)
      assert(xr.getLong(0) === id)
      // same validity rule
      assert(jr.getBoolean(5) === (id % 13 != 0))
      assert(xr.getBoolean(4) === (id % 13 != 0))
      if (id % 13 != 0) {
        // same foo / composition across formats
        assert(jr.getString(2) === xr.getString(2))
        assert(jr.getString(4) === xr.getString(3))
        // bar: boolean in JSON, its string form in XML; both null on the
        // planted missing-path docs
        if (id % 11 == 0) { assert(jr.isNullAt(1)); assert(xr.isNullAt(1)) }
        else assert(jr.getBoolean(1).toString === xr.getString(1))
        // na sentinel dropped only in JSON path (XML mapping has no na field)
        if (id % 5 == 0) assert(jr.isNullAt(3))
        else assert(jr.getString(3) === s"v${id % 5}")
      }
    }
  }
}
