package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

class WindowHashesSpec extends SparkSpec {

  import spark.implicits._

  /** The declarative twin the native expression must match:
    * positional xxhash64 over w-word windows of split(trim(text), \s+). */
  private def declarative(text: Column, w: Int): Column = {
    val ws = split(trim(text), "\\s+")
    val mk = (v: Column) =>
      transform(sequence(lit(0), size(v) - w),
        i => xxhash64(array_join(slice(v, i + 1, lit(w)), " ")))
    element_at(transform(array(ws), mk), 1)
  }

  test("native hashes are value-identical to the declarative chain on the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val w = 6
    val mismatches = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= w)
      .select(GraftFunctions.windowHashes(col("text"), w).as("native"),
        declarative(col("text"), w).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(mismatches == 0L)
  }

  test("windows come back in position order with duplicates kept") {
    val out = Seq("a b a b a b").toDF("text")
      .select(GraftFunctions.windowHashes(col("text"), 2).as("h"))
      .as[Seq[Long]].head()
    assert(out.length == 5)
    assert(out(0) == out(2) && out(2) == out(4)) // "a b" thrice
    assert(out(1) == out(3))                     // "b a" twice
    assert(out(0) != out(1))
  }

  test("separator edge cases match the declarative split semantics") {
    val w = 2
    val cases = Seq(
      "  leading spaces trimmed",
      "trailing spaces trimmed   ",
      "double  space between",
      "\ttab leads to empty first token",
      "mixed \t whitespace\nruns",
      "exactly two",
      "one", // fewer than w words
      "unicode héllo wörld ≠ ascii")
    val out = cases.toDF("text")
      .select(col("text"),
        GraftFunctions.windowHashes(col("text"), w).as("native"),
        when(size(split(trim(col("text")), "\\s+")) >= w,
          declarative(col("text"), w))
          .otherwise(array().cast("array<bigint>")).as("decl"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("SQL registration accepts integral literals of any width") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(graft_window_hashes('a b c d', 2L)) AS n").as[Int].head()
    assert(n == 3)
  }
}
