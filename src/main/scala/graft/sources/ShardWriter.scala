package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic training-shard writer: the last step of a curation
  * pipeline, where the kept corpus is laid out for the trainer.
  *
  * Training wants documents decorrelated from their crawl/source order;
  * pipelines want byte-identical re-runs. Both come from hashing, not
  * RNG: a document's shard is `xxhash64(id) mod n` and its in-shard
  * position is (hash, id) order, so membership, order, and file count
  * are pure functions of the data — any engine, any cluster size, any
  * re-run produces the same shards. (`repartitionByRange` is NOT used:
  * its range boundaries come from seeded sampling that varies across
  * runs.)
  *
  * All rows of a shard hash to the same partition, so each shard
  * directory holds exactly one file; a 100 TB corpus writes n
  * independent files with no global sort and one shuffle.
  */
object ShardWriter {

  def writeShards(df: DataFrame, idCol: String, outDir: String, nShards: Int): Unit =
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(nShards)).cast("int"))
      .withColumn("__pos", xxhash64(col(idCol), lit(1)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__pos"), col(idCol))
      .drop("__pos")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)
}
