package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClosureOpsSpec extends SparkSpec {

  test("path-doubling closure matches the arithmetic ancestor set") {
    // same hierarchy orgClosure uses: parent(i) = i/2, nodes 1..99
    val nodes = (1 until 100).map(_.toLong)
    val edges = {
      import spark.implicits._
      nodes.toDF("node").select(col("node"),
        floor(col("node") / 2).cast("long").as("parent"))
    }
    val closure = ClosureOps.ancestorClosure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val expected = nodes.flatMap { n =>
      Iterator.iterate(n >> 1)(_ >> 1).takeWhile(_ >= 0)
        .zipWithIndex
        .map { case (anc, i) => (n, anc, i + 1) }
        .takeWhile { case (_, anc, d) => d == 1 || (n >> (d - 1)) > 0 }
        .toSeq
    }.toSet
    assert(closure === expected)
  }

  test("deep chain closes in O(log depth) iterations") {
    // a single 64-deep chain: 0 <- 1 <- 2 <- ... <- 64
    val edges = {
      import spark.implicits._
      (1 to 64).map(i => (i.toLong, i.toLong - 1)).toDF("node", "parent")
    }
    val rows = ClosureOps.ancestorClosure(edges).count()
    // node i has i ancestors (i-1 .. 0) => sum 1..64
    assert(rows === (1 to 64).sum.toLong)
  }
}
