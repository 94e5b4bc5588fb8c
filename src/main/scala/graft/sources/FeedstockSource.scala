package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feedstock I/O: the reference's ingestion format is JSON-lines, one
  * record per line, each carrying an `mdf` block (source_id, version,
  * resource_type) next to the record payload — the shape MDF Search is
  * fed with after extraction.
  *
  * Spark-first: schema-on-read with an explicit StructType (no inference
  * pass over 100 TB), written back as partitioned JSON-lines. Parquet
  * stays the analytics format; feedstock is the interchange format.
  */
object FeedstockSource {

  val schema: StructType = StructType(Seq(
    StructField("mdf", StructType(Seq(
      StructField("source_id", StringType),
      StructField("source_name", StringType),
      StructField("version", IntegerType),
      StructField("resource_type", StringType)))),
    StructField("record", StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType))))))

  /** Read a feedstock directory (JSON-lines) with the fixed schema. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Flatten feedstock into the documents-like analytics shape. */
  def flatten(feedstock: DataFrame): DataFrame =
    feedstock.select(
      col("mdf.source_id").as("source_id"),
      col("mdf.source_name").as("source_name"),
      col("mdf.version").as("version"),
      col("mdf.resource_type").as("resource_type"),
      col("record.doc_id").as("doc_id"),
      col("record.text").as("text"),
      col("record.lang").as("lang"))

  /** Build feedstock records from the documents table (dataset→feedstock
    * is the reference's extract step output). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      struct(
        concat(lit("ds"), (col("doc_id") % 40).cast("string"), lit("_v"),
          ((col("doc_id") % 3) + 1).cast("string"), lit(".0")).as("source_id"),
        concat(lit("ds"), (col("doc_id") % 40).cast("string")).as("source_name"),
        ((col("doc_id") % 3) + 1).cast("int").as("version"),
        lit("record").as("resource_type")).as("mdf"),
      struct(col("doc_id"), col("text"), col("lang"), col("source"))
        .as("record"))

  /** Write feedstock as JSON-lines partitioned by source_name — the
    * partition column is the natural ingest unit (one dataset's records
    * land together; partition pruning serves per-dataset reads). */
  def write(feedstock: DataFrame, path: String): Unit =
    feedstock
      .withColumn("source_name", col("mdf.source_name"))
      .write.mode("overwrite")
      .partitionBy("source_name")
      .json(path)
}
