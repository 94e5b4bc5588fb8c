package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Value-identity pins for the round-10 native text expressions
  * ([[ShingleStrings]], [[SimHash64]]) against the interpreted chains
  * they replace. */
class NativeTextExprSpec extends SparkSpec {

  import spark.implicits._

  private val edgeCases = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "dup dup dup dup", // duplicate shingles collapse
    3L -> "a b c",
    4L -> "two words",
    5L -> "one",
    6L -> "",
    7L -> "double  space empty token run",
    8L -> "trailing space ",
    9L -> " leading space",
    10L -> "unicode héllo wörld ≠ ascii ünit")

  // ---------------------------------------------- ShingleStrings

  /** The interpreted twin from DedupOps.shinglesOf. */
  private def declShingles(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    val mk = (v: Column) =>
      array_distinct(transform(sequence(lit(0), size(v) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(v, i + k + 1)): _*)))
    when(size(ws) >= n, element_at(transform(array(ws), mk), 1))
      .otherwise(array().cast("array<string>"))
  }

  test("shingle strings match the interpreted chain on the corpus (as sets)") {
    val n = 3
    val mism = graft.Tables.documents(spark, sfDir)
      .select(array_sort(GraftFunctions.shingleStrings(col("text"), n)).as("nat"),
        array_sort(declShingles(col("text"), n)).as("dec"))
      .filter(col("nat") =!= col("dec"))
      .count()
    assert(mism == 0L)
  }

  test("shingle strings match on whitespace/unicode edge cases") {
    val n = 2
    val out = edgeCases.toDF("doc_id", "text")
      .select(col("text"),
        array_sort(GraftFunctions.shingleStrings(col("text"), n)).as("nat"),
        array_sort(declShingles(col("text"), n)).as("dec"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("q_top_ngrams over the native pass equals the interpreted-chain query") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nat = graft.functions.TextFunctions.topNgrams(spark, sfDir)
    val dec = graft.operators.DedupOps.shinglesOf(docs, "doc_id", "text", 3)
      .select(explode(col("sh")).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram").asc)
      .limit(graft.functions.TextFunctions.topNgramsK)
    assert(nat.collect().toSeq == dec.collect().toSeq)
  }

  // ---------------------------------------------- SimHash64

  /** The aggregate chain SimHash64 replaces. */
  private def aggSimhash(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("word")))
      .groupBy(col("doc_id"))
      .agg(GraftFunctions.simhash(col("h"), col("cnt")).as("simhash"))

  test("native simhash matches the SimHashAgg chain on the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nat = docs.select(col("doc_id"),
      GraftFunctions.simhash64(col("text")).as("simhash"))
    val agg = aggSimhash(docs)
    assert(nat.exceptAll(agg).count() == 0L)
    assert(agg.exceptAll(nat).count() == 0L)
  }

  test("native simhash matches the chain on edge cases (incl. empty and repeated words)") {
    val docs = edgeCases.toDF("doc_id", "text")
    val nat = docs.select(col("doc_id"),
      GraftFunctions.simhash64(col("text")).as("simhash"))
    val agg = aggSimhash(docs)
    assert(nat.exceptAll(agg).count() == 0L)
    assert(agg.exceptAll(nat).count() == 0L)
  }
}
