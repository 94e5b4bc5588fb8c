package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeedstockV2Spec extends SparkSpec {

  private def writtenDir(): String =
    FeedstockFixtures.writtenDir(spark, sfDir, "feedstock-v2")

  test("DSv2 read matches the schema-on-read path row for row") {
    val dir = writtenDir()
    val v2 = FeedstockSource.flatten(
      spark.read.format("graft-feedstock").load(dir))
    val v1 = FeedstockSource.flatten(FeedstockSource.read(spark, dir))
    assert(v2.count() == v1.count())
    val a = v2.orderBy("doc_id").collect().map(_.toSeq)
    val b = v1.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("column pruning reaches the scan: one-leaf projection ships a one-leaf schema") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .select(col("record.doc_id").as("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    // the Scan.description embeds the pruned ReadSchema; text/lang and
    // the whole mdf block must not survive pruning
    assert(plan.contains("graft-feedstock"), plan.take(500))
    val desc = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(desc.contains("doc_id"))
    assert(!desc.contains("text") && !desc.contains("source_id"), desc)
    // and the data still comes back
    assert(q.agg(count(lit(1))).collect()(0).getLong(0) ==
      graft.Tables.documents(spark, sfDir).count())
  }

  test("limit pushdown: the reader stops parsing the file at its cap") {
    // one file: 3 good lines, then a line that would crash the JSON
    // parser. With LIMIT 3 pushed, the reader must never reach it.
    val dir = java.nio.file.Files.createTempDirectory("feedstock-limit")
    val f = dir.resolve("data.jsonl")
    val good = (1 to 3).map(i =>
      s"""{"dataset": "d", "record": {"doc_id": $i, "text": "t$i", "lang": "en"}}""")
    java.nio.file.Files.writeString(f,
      (good :+ "{ this is not json").mkString("\n"))

    val q = spark.read.format("graft-feedstock").load(dir.toString).limit(3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), plan.take(800))
    // without the pushdown this collect would throw on line 4
    assert(q.collect().length === 3)
    // and a full scan of the same file DOES reach the bad line
    intercept[Exception] {
      spark.read.format("graft-feedstock").load(dir.toString).collect()
    }
  }

  test("aggregate pushdown: count/min/max fold per-file, merged result exact") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .agg(count(lit(1)).as("n"),
        min(col("record.doc_id")).as("lo"),
        max(col("record.doc_id")).as("hi"),
        max(col("record.lang")).as("lz"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan.take(1200))
    val r = q.collect()(0)
    val docs = graft.Tables.documents(spark, sfDir)
    assert(r.getLong(0) === docs.count())
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === docs.count() - 1)
    assert(r.getString(3) ===
      docs.agg(max(col("lang"))).collect()(0).getString(0))
  }

  test("aggregate pushdown composes with pushed filters") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .filter(col("record.lang") === "en")
      .agg(count(lit(1)).as("n"), min(col("record.doc_id")).as("lo"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan.take(1200))
    assert(plan.contains("EqualTo(record.lang,en)"), plan.take(1200))
    val r = q.collect()(0)
    val en = graft.Tables.documents(spark, sfDir).filter(col("lang") === "en")
    assert(r.getLong(0) === en.count())
    assert(r.getLong(1) === en.agg(min("doc_id")).collect()(0).getLong(0))
  }

  test("DSv2 write + read round trip through the connector") {
    val docs = graft.Tables.documents(spark, sfDir)
    val feedstock = FeedstockSource.fromDocuments(docs)
    val tmp = java.nio.file.Files.createTempDirectory("feedstock-v2w").toString
    feedstock.write.format("graft-feedstock").mode("append").save(tmp)
    val back = FeedstockSource.flatten(
      spark.read.format("graft-feedstock").load(tmp))
    assert(back.count() == docs.count())
    val a = back.orderBy("doc_id").select("doc_id", "text", "source_id")
      .collect().map(_.toSeq)
    val b = FeedstockSource.flatten(feedstock).orderBy("doc_id")
      .select("doc_id", "text", "source_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("task attempts are invisible until commit; abort leaves nothing behind") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val tmp = java.nio.file.Files.createTempDirectory("feedstock-v2a").toString
    val schema = StructType(Seq(StructField("s", StringType)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val factory = FeedstockWriterFactory(tmp, schema, conf)
    // ignore the local filesystem's .crc checksum sidecars
    def files() = new java.io.File(tmp).listFiles().toSeq.map(_.getName)
      .filterNot(_.endsWith(".crc")).sorted

    // two concurrent attempts of partition 0 (a speculative retry):
    // distinct task ids → distinct paths, both invisible to a reader
    val w1 = factory.createWriter(0, 11L)
    val w2 = factory.createWriter(0, 12L)
    w1.write(InternalRow(UTF8String.fromString("from-attempt-11")))
    w2.write(InternalRow(UTF8String.fromString("from-attempt-12")))
    assert(files().forall(_.startsWith(".")), s"in-progress files must hide: ${files()}")
    assert(spark.read.format("graft-feedstock").schema(schema).load(tmp).count() == 0)

    // only the committed attempt's file survives with a final name
    w1.commit()
    w2.abort()
    assert(files() == Seq("part-0-11.jsonl"), files().toString)
    assert(spark.read.format("graft-feedstock").schema(schema).load(tmp).count() == 1)
  }
}
