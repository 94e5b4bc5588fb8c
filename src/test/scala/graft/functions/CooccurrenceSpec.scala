package graft.functions

import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {

  test("co-occurrence board equals a direct windowed recomputation") {
    val got = TextFunctions.cooccurrence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length === TextFunctions.coocTopK)
    got.foreach { case (wa, wb, wt) =>
      assert(wa <= wb, "canonical unordered pair")
      assert(wt >= TextFunctions.coocMinWeight)
    }
    // brute-force recomputation of the integer-weighted matrix
    val weights = Array(0L, 12L, 6L, 4L, 3L)
    val acc = scala.collection.mutable.Map[(String, String), Long]()
    graft.Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      val ws = r.getString(0).trim.split("\\s+")
      for (i <- ws.indices; d <- 1 to math.min(TextFunctions.coocWindow, ws.length - 1 - i)) {
        val k = if (ws(i) <= ws(i + d)) (ws(i), ws(i + d)) else (ws(i + d), ws(i))
        acc(k) = acc.getOrElse(k, 0L) + weights(d)
      }
    }
    val expected = acc.toSeq
      .filter(_._2 >= TextFunctions.coocMinWeight)
      .sortBy { case ((a, b), w) => (-w, a, b) }
      .take(TextFunctions.coocTopK)
      .map { case ((a, b), w) => (a, b, w) }
    assert(got.toSeq === expected)
  }
}
