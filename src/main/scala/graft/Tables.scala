package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated test tables.
  *
  * At production scale these are date-partitioned parquet fact tables
  * (lineitem/orders/events/documents) and small broadcastable dimensions
  * (region/nation/supplier/part); the loaders are the single seam where a
  * deployment would swap in its own catalog/bucketing.
  */
object Tables {
  val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings", "customer")
  val dimTables  = Seq("region", "nation", "supplier", "part")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as nanos-since-epoch (legacy conf) and truncate to
    * microseconds — the same truncation DuckDB applies when it loads the
    * column into its micro-resolution TIMESTAMP, so oracles line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    // one-time session setup (the conf is session-wide, not a per-read
    // datasource option); skip the mutation once it's in place
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Runtime tuning applied by every entry point. AQE re-plans shuffles at
    * runtime (skew joins, partition coalescing) — essential at cluster scale,
    * harmless locally. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // SimHashAgg buffers are 512 B; keep ObjectHashAggregate in hash mode
    // well past the conservative 128-key default before sort fallback.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    // NOTE: do not lower spark.sql.codegen.hugeMethodLimit. Exceeding it
    // does not split the stage — it abandons whole-stage codegen for the
    // whole plan (interpreted fallback), a measured ~3x slowdown across
    // this suite. Method splitting is already handled by
    // spark.sql.codegen.methodSplitThreshold inside codegen.
    spark
  }
}
