package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized end-to-end agreement: for arbitrary supported predicates,
  * the DSv2 read (where the predicate is pushed and evaluated on the
  * raw JSON node before row conversion) must return exactly the rows
  * the schema-on-read path returns with Spark evaluating the same
  * predicate post-conversion. This is the divergence the shared
  * FeedstockLeaf coercion is designed away — the property guards the
  * comparison logic around it (orderings, null semantics, prefix). */
class FeedstockFilterPropSpec extends SparkSpec {

  private lazy val dir = FeedstockFixtures.writtenDir(spark, sfDir, "graft-fprop")

  private val predGen: Gen[Column] = {
    val docId = Gen.choose(-5L, 600L).flatMap(v => Gen.oneOf(
      col("record.doc_id") === v, col("record.doc_id") > v,
      col("record.doc_id") >= v, col("record.doc_id") < v,
      col("record.doc_id") <= v))
    val version = Gen.choose(0, 4).flatMap(v => Gen.oneOf(
      col("mdf.version") === v, col("mdf.version") >= v,
      col("mdf.version") < v))
    val lang = Gen.oneOf("a", "e", "en", "zz", "").flatMap(s => Gen.oneOf(
      col("record.lang") === s, col("record.lang").startsWith(s),
      col("record.lang") > s))
    val sourceId = Gen.oneOf("ds1", "ds1_v", "ds39_v3.0", "x").flatMap(s =>
      Gen.oneOf(col("mdf.source_id").startsWith(s), col("mdf.source_id") === s))
    Gen.oneOf(docId, version, lang, sourceId)
  }

  private val predsGen: Gen[Seq[Column]] =
    Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, predGen))

  test("pushed evaluation equals Spark-side evaluation for arbitrary supported predicates") {
    val viaJson = spark.read.schema(FeedstockSource.schema).json(dir)
    val viaDsv2 = spark.read.format("graft-feedstock").load(dir)
    val prop = Prop.forAll(predsGen) { preds =>
      val p = preds.reduce(_ && _)
      val a = viaJson.filter(p).select(col("record.doc_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      val b = viaDsv2.filter(p).select(col("record.doc_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
