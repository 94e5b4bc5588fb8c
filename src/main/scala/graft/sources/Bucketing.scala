package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table tier: pay the shuffle once at write time, join and
  * aggregate forever after without one.
  *
  * At 100 TB the dominant cost of every fact-fact join is the exchange
  * of both sides on the join key. Bucketing persists that partitioning
  * INTO the table layout: each side is hash-partitioned into the same
  * number of buckets on the key and sorted within buckets, so a join of
  * two tables bucketed on their join key plans as a sort-merge join
  * with ZERO Exchange nodes — every executor reads already-co-located,
  * already-sorted bucket files. The same applies to `groupBy(key)` on a
  * single bucketed table. This is the standing answer to "is there a
  * shuffle here that becomes the bottleneck at scale": for the joins a
  * pipeline runs repeatedly (fact-to-fact enrichment, incremental
  * merges), the answer becomes no, by construction.
  *
  * Counterpart of the reference's keyed Dynamo tables (aws/utils.py
  * table lookups keyed by source_id): the key-addressed layout is what
  * makes repeated keyed access cheap; here it additionally co-locates
  * equal keys across tables.
  *
  * Bucket-count discipline: both sides of a co-located join must use
  * the SAME bucket count (Spark joins b-vs-b without exchange, and
  * b-vs-kb only one side bucketed); pick counts per key domain once and
  * register them, the way shuffle partition counts are picked per
  * cluster.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted parquet table. One file
    * per bucket per task; callers that need exactly one file per bucket
    * (to also elide the in-join Sort) should `.repartition(n, key)`
    * first so each bucket is written by one task. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog, so
    * the scan reports its hash partitioning to the planner). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Join two same-bucket-count tables on their bucket key. This is a
    * plain equi-join — the point is what the planner does with it:
    * both scans expose HashPartitioning(key, buckets), which satisfies
    * the sort-merge join's ClusteredDistribution on both sides, so the
    * plan contains no Exchange. Asserted in BucketingSpec. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
  }
}
