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

  test("cyclic edges converge to the bounded pair set with shortest depths") {
    // 3-cycle 1 -> 2 -> 3 -> 1: every node reaches every node (incl.
    // itself); state must stay bounded at the 9 pairs, not grow with 2^k
    // path lengths
    val edges = {
      import spark.implicits._
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("node", "parent")
    }
    val closure = ClosureOps.ancestorClosure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Set(
      (1L, 2L, 1), (1L, 3L, 2), (1L, 1L, 3),
      (2L, 3L, 1), (2L, 1L, 2), (2L, 2L, 3),
      (3L, 1L, 1), (3L, 2L, 2), (3L, 3L, 3))
    assert(closure === expected)
  }
}
