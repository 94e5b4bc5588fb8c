package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherFilterSpec extends SparkSpec {

  test("every rule flag is consistent with its stat, keep is the conjunction") {
    val out = TextFunctions.gopherFilter(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getInt(1)
      val meanLen = r.getDouble(2)
      val alpha = r.getDouble(3)
      val symbol = r.getDouble(4)
      val nStop = r.getInt(5)
      assert(r.getBoolean(6) == (nWords >= 50 && nWords <= 100000))
      assert(r.getBoolean(7) == (meanLen >= 3.0 && meanLen <= 10.0))
      assert(r.getBoolean(8) == (alpha >= 0.8))
      assert(r.getBoolean(9) == (symbol <= 0.1))
      assert(r.getBoolean(10) == (nStop >= 2))
      assert(r.getBoolean(11) ==
        (r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8) &&
          r.getBoolean(9) && r.getBoolean(10)))
    }
  }

  test("the cascade actually discriminates on this corpus") {
    val out = TextFunctions.gopherFilter(spark, sfDir)
    val byKeep = out.groupBy(col("keep")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // the synthetic corpus has docs on both sides of the 50-word bound
    assert(byKeep.getOrElse(true, 0L) > 0, "no doc passes the cascade")
    assert(byKeep.getOrElse(false, 0L) > 0, "no doc fails the cascade")
  }

  test("plan is a single map-side projection: no shuffle") {
    val plan = TextFunctions.gopherFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final orderBy's range partitioning
    val exchanges = "Exchange [a-z]+partitioning".r
      .findAllIn(plan).toList
    assert(exchanges.forall(_.contains("rangepartitioning")), plan)
  }
}
