package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.types._

/** Schema-drift canary: loads every table at every scale factor and pins the
  * POST-LOADER logical types the rest of the engine assumes. When the
  * testdata generator changes a physical encoding (as events.ts did:
  * TIMESTAMP(NANOS) → timestamp[us]/NTZ), this suite fails with one clear
  * message instead of N opaque analysis errors downstream. Mirrors the
  * reference's schemaless-scan posture (aws/dynamo_manager.py:129-280 never
  * assumes a physical attribute encoding).
  */
class SchemaDriftSpec extends SparkSpec {
  val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** table -> required (column, type) contract the operators rely on.
    * Types are the POST-LOADER Spark logical types (e.g. events.ts is always
    * session-zoned TIMESTAMP after Tables.events, whatever the file holds;
    * o_orderdate/l_shipdate are TIMESTAMP_NTZ as written by the generator). */
  val contracts: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
                      "p_type" -> StringType, "p_size" -> IntegerType,
                      "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
                      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
                      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
                      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
                      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType),
    "events"   -> Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents"  -> Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
                        "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType)
  )

  val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "region" -> Tables.region, "nation" -> Tables.nation, "customer" -> Tables.customer,
      "supplier" -> Tables.supplier, "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings
    )

  for (dir <- sfDirs; (tbl, cols) <- contracts.toSeq.sortBy(_._1)) {
    test(s"$tbl at $dir exposes the contracted logical types") {
      val df = loaders(tbl)(spark, dir)
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      for ((name, expected) <- cols) {
        assert(actual.contains(name), s"$tbl missing column $name; has ${actual.keys.toSeq.sorted}")
        // accept any array element nullability; everything else is exact
        (expected, actual(name)) match {
          case (ArrayType(e1, _), ArrayType(e2, _)) =>
            assert(e1 == e2, s"$tbl.$name: expected array<$e1>, got array<$e2>")
          case (e, a) =>
            assert(e == a, s"$tbl.$name: expected $e, got $a (physical encoding drifted?)")
        }
      }
    }
  }

  test("normalizeEventTs adapts every physical ts encoding to TIMESTAMP") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    // TIMESTAMP (session-zoned): pass-through
    val tzed = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("event_id", "ts")
    assert(Tables.normalizeEventTs(tzed).schema("ts").dataType == TimestampType)

    // TIMESTAMP_NTZ: cast in the UTC session
    val ntz = tzed.select(col("event_id"),
      col("ts").cast(TimestampNTZType).as("ts"))
    val ntzOut = Tables.normalizeEventTs(ntz)
    assert(ntzOut.schema("ts").dataType == TimestampType)
    assert(ntzOut.head().getTimestamp(1) == tzed.head().getTimestamp(1))

    // raw epoch-nanos LongType (the legacy nanosAsLong read): truncate
    // to micros
    val nanos = Seq((1L, 1704067201123456789L)).toDF("event_id", "ts")
    val nanosOut = Tables.normalizeEventTs(nanos)
    assert(nanosOut.schema("ts").dataType == TimestampType)
    assert(nanosOut.selectExpr("unix_micros(ts)").head().getLong(0)
      == 1704067201123456L)

    // anything else is a loud error, not silent miscasting
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    intercept[RuntimeException] { Tables.normalizeEventTs(bad) }
  }

  test("events loader yields readable non-empty timestamps") {
    val row = Tables.events(spark, sfDirs.head)
      .selectExpr("min(ts) as lo", "max(ts) as hi", "count(*) as n").head()
    assert(row.getLong(2) > 0)
    assert(row.getTimestamp(0) != null && row.getTimestamp(1) != null)
    assert(row.getTimestamp(0).before(row.getTimestamp(1)))
  }
}
