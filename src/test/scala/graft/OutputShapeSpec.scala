package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-gate output contract: the correctness harness canonicalizes
  * results via a pandas sort + hash, and an array/struct/map cell is
  * unhashable there — a query that ships one goes red at the driver
  * even when its values are correct (round 5's q_embed_centroids).
  * This spec turns that remote failure into a local one: every query
  * with a SQL oracle must emit top-level scalar columns only. Queries
  * whose natural output is a vector explode it to one scalar row per
  * element (see AnnOps.quantizeEmbeddings / embedCentroids).
  */
class OutputShapeSpec extends SparkSpec {

  test("every SQL-oracle query emits top-level scalar columns only") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val bad = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] => f.name
      }
      if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"non-scalar driver-gate outputs — explode them to scalar rows: $offenders")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
