package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count => V2Count, CountStar, Max => V2Max, Min => V2Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Feedstock as a first-class DataSourceV2 connector:
  *
  *   spark.read.format("graft-feedstock").load(path)
  *
  * The connector tier matters at 100 TB because it is where pruning
  * happens: the ScanBuilder implements SupportsPushDownRequiredColumns,
  * so a query that selects `record.doc_id` ships a one-leaf schema to
  * every partition reader and the JSON parser materializes exactly that
  * field — nothing else is converted to Catalyst rows. Splits are one
  * per file (feedstock arrives as many per-dataset files, which is the
  * parallelism), and the reader streams lines — no whole-file buffering.
  *
  * Mirrors the reference's feedstock ingestion boundary
  * (aws/submit.py's extracted-feedstock hand-off); the declarative
  * helpers in [[FeedstockSource]] remain the schema-on-read path.
  */
class FeedstockDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-feedstock"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedstockSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FeedstockTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

class FeedstockTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-feedstock($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeedstockScanBuilder(path, tableSchema,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FeedstockWriteBuilder(path, info.schema())
}

/** Batch write: one JSON-lines file per task attempt, named by
  * (partition, task) so concurrent speculative / zombie attempts never
  * share a path. Each attempt writes to a dot-prefixed in-progress file
  * (invisible to the reader, which skips `.`/`_` names) and renames to
  * its final name only in task commit — which Spark's output-commit
  * coordinator grants to at most one attempt per partition. Task abort
  * deletes the in-progress file; job abort deletes any files that
  * committed before the failure, so a failed job leaves no partial
  * output behind. */
class FeedstockWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // overwrite == rewrite the dir
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      // capture the session's Hadoop conf on the driver so spark.hadoop.*
      // and filesystem credentials reach the executor-side writers
      private val conf = new SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        FeedstockWriterFactory(path, schema, conf)
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        messages.foreach {
          case FeedstockCommit(file) =>
            val p = new Path(file)
            p.getFileSystem(conf.value).delete(p, false)
          case _ => ()
        }
    }
  }
}

case class FeedstockWriterFactory(path: String, schema: StructType,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FeedstockDataWriter(
      s"$path/part-$partitionId-$taskId.jsonl", schema, conf.value)
}

class FeedstockDataWriter(file: String, schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()
  private val dest = new Path(file)
  // in-progress name starts with '.' → skipped by the reader's file filter
  private val tmp = new Path(dest.getParent, s".${dest.getName}.inprogress")
  private val fs = dest.getFileSystem(conf)
  private val out = {
    fs.mkdirs(dest.getParent)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    out.write(FeedstockDataWriter.toJson(mapper, row, schema))
    out.write("\n")
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    fs.delete(dest, false) // idempotent re-commit of a retried task
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"graft-feedstock: rename $tmp -> $dest failed")
    FeedstockCommit(dest.toString)
  }
  override def abort(): Unit = { out.close(); fs.delete(tmp, false) }
  override def close(): Unit = ()
}

case class FeedstockCommit(file: String) extends WriterCommitMessage

object FeedstockDataWriter {
  def toJson(mapper: ObjectMapper, row: InternalRow, st: StructType): String = {
    val node = mapper.createObjectNode()
    st.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case s: StructType =>
          node.set(f.name, mapper.readTree(
            toJson(mapper, row.getStruct(i, s.size), s)))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case IntegerType => node.put(f.name, row.getInt(i))
        case LongType => node.put(f.name, row.getLong(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case other =>
          throw new IllegalArgumentException(
            s"graft-feedstock write: unsupported leaf type ${other.catalogString}")
      }
    }
    mapper.writeValueAsString(node)
  }
}

class FeedstockScanBuilder(path: String, full: StructType,
    maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Int = -1
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** LIMIT reaches the reader: each partition stops parsing after
    * `limit` surviving lines (pushed filters still apply first), so a
    * `LIMIT k` over a TB-scale feedstock directory reads ~k lines per
    * file instead of every byte. Partial push — Spark keeps its global
    * Limit operator; the reader's cap is a per-partition I/O bound,
    * which is exactly the split of work a distributed LIMIT wants. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  /** Accept simple predicates on top-level leaf columns; they are
    * evaluated against the parsed JSON node BEFORE row conversion, so
    * a selective filter skips the Catalyst conversion for ~all lines
    * (the JSON analog of parquet's PushedFilters). Accepted filters
    * are removed from Spark's residual, so the reader's evaluation
    * must be exact — hence the conservative supported set. Everything
    * else (nested fields, null-matching, string ops beyond prefix)
    * stays Spark-side. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (ok, residual) = filters.partition(FeedstockFilters.supports(_, full))
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  /** Global COUNT/MIN/MAX collapse into the readers: each partition
    * scans its file once and emits ONE partial-aggregate row (pushed
    * filters still apply line-by-line first), so `SELECT count(*),
    * max(ts) FROM feedstock` moves a handful of longs per file instead
    * of every row. Partial push — Spark's final aggregate merges the
    * per-partition rows (sum of counts, min of mins, max of maxs), so
    * the reader only needs per-file accumulators. GROUP BY, DISTINCT
    * and non-leaf columns stay Spark-side. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (limit >= 0 || agg.groupByExpressions().nonEmpty) return false
    def pathOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case n: org.apache.spark.sql.connector.expressions.NamedReference =>
          Some(n.fieldNames().mkString("."))
        case _ => None
      }
    val specs: Array[Option[FeedstockAgg]] = agg.aggregateExpressions().map {
      case _: CountStar => Some(AggCountStar: FeedstockAgg)
      case c: V2Count if !c.isDistinct =>
        pathOf(c.column()).filter(FeedstockFilters.leafType(_, full).isDefined)
          .map(AggCount(_): FeedstockAgg)
      case m: V2Min =>
        pathOf(m.column()).flatMap(p =>
          FeedstockFilters.leafType(p, full).map(AggMin(p, _): FeedstockAgg))
      case m: V2Max =>
        pathOf(m.column()).flatMap(p =>
          FeedstockFilters.leafType(p, full).map(AggMax(p, _): FeedstockAgg))
      case _ => None
    }
    if (specs.nonEmpty && specs.forall(_.isDefined)) {
      aggs = Some(specs.map(_.get).toSeq)
      required = StructType(aggs.get.zipWithIndex.map {
        case (AggCountStar, i)  => StructField(s"agg_$i", LongType, nullable = false)
        case (AggCount(_), i)   => StructField(s"agg_$i", LongType, nullable = false)
        case (AggMin(_, dt), i) => StructField(s"agg_$i", dt)
        case (AggMax(_, dt), i) => StructField(s"agg_$i", dt)
      }.toArray)
      true
    } else false
  }
  private var aggs: Option[Seq[FeedstockAgg]] = None

  override def build(): Scan = new FeedstockScan(path, required, full, pushed, limit, aggs,
    // driver-side: capture the session's Hadoop conf (spark.hadoop.*,
    // fs credentials) for both split listing and the executor readers
    new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()),
    maxFilesPerTrigger)
}

/** Pushed partial-aggregate shapes the feedstock reader can fold
  * per-file. */
private[sources] sealed trait FeedstockAgg extends Serializable
private[sources] case object AggCountStar extends FeedstockAgg
private[sources] final case class AggCount(path: String) extends FeedstockAgg
private[sources] final case class AggMin(path: String, dt: DataType) extends FeedstockAgg
private[sources] final case class AggMax(path: String, dt: DataType) extends FeedstockAgg

/** THE single JSON-leaf → Catalyst coercion, shared by the row
  * converter ([[FeedstockPartitionReader.convert]]) and the pushed-
  * filter compiler ([[FeedstockFilters.compile]]). An accepted filter
  * is removed from Spark's residual, so the value a filter compares
  * MUST be the value the converted row would carry — one shared
  * coercion makes divergence impossible rather than merely untested. */
private[sources] object FeedstockLeaf {
  def coerce(n: JsonNode, dt: DataType): Any = dt match {
    case StringType  => UTF8String.fromString(n.asText())
    case IntegerType => n.asInt()
    case LongType    => n.asLong()
    case DoubleType  => n.asDouble()
    case BooleanType => n.asBoolean()
    case other => throw new IllegalArgumentException(
      s"graft-feedstock: unsupported leaf type ${other.catalogString}")
  }
}

/** Pushed-filter support + evaluation over the raw JSON node. */
object FeedstockFilters {
  import org.apache.spark.sql.sources._

  /** Resolve a (possibly dotted, nested) column path to its leaf type —
    * V2 pushdown translates nested predicates with dotted names. */
  private[sources] def leafType(name: String, schema: StructType): Option[DataType] = {
    def walk(parts: List[String], dt: DataType): Option[DataType] = (parts, dt) match {
      case (Nil, t @ (IntegerType | LongType | DoubleType | StringType | BooleanType)) =>
        Some(t)
      case (head :: rest, st: StructType) =>
        st.fields.find(_.name == head).flatMap(f => walk(rest, f.dataType))
      case _ => None
    }
    walk(name.split("\\.").toList, schema)
  }

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v) => leafType(a, schema).isDefined && v != null
    case GreaterThan(a, v) => leafType(a, schema).isDefined && v != null
    case GreaterThanOrEqual(a, v) => leafType(a, schema).isDefined && v != null
    case LessThan(a, v) => leafType(a, schema).isDefined && v != null
    case LessThanOrEqual(a, v) => leafType(a, schema).isDefined && v != null
    case IsNotNull(a) => leafType(a, schema).isDefined
    case StringStartsWith(a, _) => leafType(a, schema).contains(StringType)
    case _ => false
  }

  /** Compile a pushed filter to a per-line predicate. Compilation
    * resolves the path segments, leaf type, and typed literal ONCE
    * (the scan evaluates the result millions of times), and the
    * comparison semantics are exactly Spark's own — an accepted filter
    * leaves Spark's residual, so any divergence from how Spark would
    * evaluate the converted row silently changes results:
    *   - integers truncate through asInt() first, matching the row
    *     conversion's truncating cast;
    *   - doubles compare via SQLOrderingUtil (-0.0 == 0.0, NaN
    *     greatest), Spark's comparator;
    *   - strings compare as unsigned UTF-8 bytes (UTF8String), not
    *     UTF-16 code units.
    * Missing/null fields fail every predicate except nothing — SQL
    * three-valued logic, identical to Spark evaluating the same
    * predicate on the converted row. */
  def compile(f: Filter, schema: StructType): JsonNode => Boolean = {
    def getter(name: String): JsonNode => JsonNode = {
      val parts = name.split("\\.")
      node => {
        var cur = node
        var i = 0
        while (i < parts.length && cur != null) { cur = cur.get(parts(i)); i += 1 }
        if (cur == null || cur.isNull) null else cur
      }
    }
    def cmpFn(name: String, v: Any): JsonNode => Option[Int] = {
      val get = getter(name)
      val dt = leafType(name, schema).get
      // literal coerced once (Number widening absorbs e.g. a BIGINT
      // literal pushed against an INT column); node values coerce
      // through the SAME [[FeedstockLeaf]] the row converter uses
      val lit: Any = dt match {
        case IntegerType => v.asInstanceOf[Number].intValue()
        case LongType    => v.asInstanceOf[Number].longValue()
        case DoubleType  => v.asInstanceOf[Number].doubleValue()
        case BooleanType => v.asInstanceOf[Boolean]
        case _           => UTF8String.fromString(v.toString)
      }
      val cmp: (Any, Any) => Int = dt match {
        case IntegerType => (a, b) =>
          java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
        case LongType => (a, b) =>
          java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
        case DoubleType => (a, b) =>
          org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(a.asInstanceOf[Double], b.asInstanceOf[Double])
        case BooleanType => (a, b) =>
          java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
        case _ => (a, b) =>
          a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      }
      node => Option(get(node)).map(n => cmp(FeedstockLeaf.coerce(n, dt), lit))
    }
    f match {
      case IsNotNull(a) =>
        val get = getter(a); node => get(node) != null
      case EqualTo(a, v) =>
        val c = cmpFn(a, v); node => c(node).contains(0)
      case GreaterThan(a, v) =>
        val c = cmpFn(a, v); node => c(node).exists(_ > 0)
      case GreaterThanOrEqual(a, v) =>
        val c = cmpFn(a, v); node => c(node).exists(_ >= 0)
      case LessThan(a, v) =>
        val c = cmpFn(a, v); node => c(node).exists(_ < 0)
      case LessThanOrEqual(a, v) =>
        val c = cmpFn(a, v); node => c(node).exists(_ <= 0)
      case StringStartsWith(a, p) =>
        val get = getter(a)
        val prefix = UTF8String.fromString(p)
        node => Option(get(node)).exists(n =>
          FeedstockLeaf.coerce(n, StringType).asInstanceOf[UTF8String].startsWith(prefix))
      case _ => _ => false
    }
  }
}

class FeedstockScan(path: String, required: StructType, full: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter], limit: Int,
    aggs: Option[Seq[FeedstockAgg]],
    conf: SerializableConfiguration,
    maxFilesPerTrigger: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-feedstock $path ReadSchema: ${required.catalogString}" +
      s" PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s" PushedLimit: $limit" else "") +
      aggs.map(a => s" PushedAggregates: [${a.mkString(", ")}]").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(conf.value)
    val it = fs.listFiles(new Path(path), true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map(_.next())
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => FeedstockInputPartition(st.getPath.toString): InputPartition)
      .toArray
    files
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FeedstockReaderFactory(required, full, pushed, limit, aggs, conf)

  /** Streaming read of the same directory:
    * `spark.readStream.format("graft-feedstock").load(path)`. Column
    * pruning and pushed filters carry over unchanged (the micro-batch
    * readers are the batch readers); pushed aggregates never occur in
    * a streaming plan. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FeedstockMicroBatchStream(path, required, full, pushed, conf,
      maxFilesPerTrigger)
}

/** High-water-mark offset: the greatest file path ingested so far
  * ("" = nothing yet). State is O(1) however many files the directory
  * accumulates — the scalable alternative to Spark's FileStreamSource
  * seen-files map, bought with the log-structured-ingest contract:
  * files are append-only and new names sort lexicographically AFTER
  * every already-ingested name (zero-padded sequence numbers,
  * timestamp prefixes — what every landing zone does). A file landing
  * with an out-of-order name is NOT picked up; that's the documented
  * trade, not a bug.
  *
  * The contract implies a FLAT landing directory: paths compare as
  * whole strings, so a hive-partitioned layout (e.g.
  * [[FeedstockSource.write]]'s `source_name=X/` dirs) would leave a
  * late file in an early-sorting partition dir permanently below the
  * watermark. Stream the flat per-batch landing zone; read
  * partitioned archives with the batch connector. */
case class FeedstockOffset(lastFile: String) extends Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    val node = m.createObjectNode()
    node.put("last", lastFile)
    m.writeValueAsString(node)
  }
}

object FeedstockOffset {
  def fromJson(json: String): FeedstockOffset =
    FeedstockOffset(new ObjectMapper().readTree(json).get("last").asText())
}

class FeedstockMicroBatchStream(path: String, required: StructType,
    full: StructType, pushed: Array[org.apache.spark.sql.sources.Filter],
    conf: SerializableConfiguration,
    maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def listSorted(): Array[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    val rootUri = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map(_.next())
      .filter { st =>
        // hidden/temp components anywhere under the landing root are
        // excluded — a recursive listing must not ingest staging or
        // metadata trees (_stage/part-*.json, _spark_metadata/0) whose
        // LEAF names look like data files
        val rel = rootUri.relativize(st.getPath.toUri).getPath
        st.isFile &&
          !rel.split("/").exists(c => c.startsWith("_") || c.startsWith("."))
      }
      .map(_.getPath.toString)
      .toArray.sorted
  }

  override def initialOffset(): Offset = FeedstockOffset("")

  override def latestOffset(): Offset = {
    val files = listSorted()
    if (files.isEmpty) FeedstockOffset("") else FeedstockOffset(files.last)
  }

  /** Admission control: `option("maxFilesPerTrigger", n)` caps each
    * micro-batch at n files — the back-pressure knob that keeps one
    * catch-up burst (a weekend of landed files) from becoming one
    * giant batch. With the cap, the offset advances n files per
    * trigger until the stream catches up. */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[FeedstockOffset].lastFile
    val pending = listSorted().filter(_ > lo)
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    if (capped.isEmpty) start else FeedstockOffset(capped.last)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[FeedstockOffset].lastFile
    val hi = end.asInstanceOf[FeedstockOffset].lastFile
    listSorted()
      .filter(f => f > lo && f <= hi)
      .map(f => FeedstockInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FeedstockReaderFactory(required, full, pushed, limit = -1, aggs = None, conf)

  override def deserializeOffset(json: String): Offset = FeedstockOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Shown as the source description in StreamingQueryProgress —
    * carries the same pruning/pushdown evidence as the batch scan's
    * description so plan audits can assert on it. */
  override def toString: String =
    s"graft-feedstock $path ReadSchema: ${required.catalogString}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"
}

case class FeedstockInputPartition(file: String) extends InputPartition

case class FeedstockReaderFactory(required: StructType, full: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter], limit: Int,
    aggs: Option[Seq[FeedstockAgg]],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FeedstockInputPartition].file
    aggs match {
      case Some(specs) =>
        new FeedstockAggReader(file, full, pushed, specs, conf.value)
      case None =>
        new FeedstockPartitionReader(file, required, full, pushed, limit, conf.value)
    }
  }
}

/** Folds one file into ONE partial-aggregate row. Values coerce
  * through the same [[FeedstockLeaf]] as the row converter and compare
  * with Spark's own orderings (unsigned UTF-8 bytes for strings,
  * SQLOrderingUtil for doubles), so the merged result is identical to
  * aggregating the converted rows. */
class FeedstockAggReader(file: String, full: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    specs: Seq[FeedstockAgg], conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val preds = pushed.map(FeedstockFilters.compile(_, full))
  private var emitted = false
  private var row: InternalRow = _

  private def leaf(node: JsonNode, path: Array[String]): JsonNode = {
    var cur = node
    var i = 0
    while (i < path.length && cur != null) { cur = cur.get(path(i)); i += 1 }
    if (cur == null || cur.isNull) null else cur
  }

  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case IntegerType => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType    => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case DoubleType  => org.apache.spark.sql.catalyst.util.SQLOrderingUtil
      .compareDoubles(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
  }

  override def next(): Boolean = {
    if (emitted) return false
    val paths = specs.map {
      case AggCount(p)  => p.split("\\.")
      case AggMin(p, _) => p.split("\\.")
      case AggMax(p, _) => p.split("\\.")
      case AggCountStar => Array.empty[String]
    }
    val counts = Array.fill(specs.length)(0L)
    val extremes = Array.fill[Any](specs.length)(null)
    val path = new Path(file)
    val in = path.getFileSystem(conf).open(path)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          val node = mapper.readTree(line)
          if (preds.forall(_(node))) {
            var i = 0
            while (i < specs.length) {
              specs(i) match {
                case AggCountStar => counts(i) += 1
                case AggCount(_)  => if (leaf(node, paths(i)) != null) counts(i) += 1
                case AggMin(_, dt) =>
                  val n = leaf(node, paths(i))
                  if (n != null) {
                    val v = FeedstockLeaf.coerce(n, dt)
                    if (extremes(i) == null || cmp(dt, v, extremes(i)) < 0) extremes(i) = v
                  }
                case AggMax(_, dt) =>
                  val n = leaf(node, paths(i))
                  if (n != null) {
                    val v = FeedstockLeaf.coerce(n, dt)
                    if (extremes(i) == null || cmp(dt, v, extremes(i)) > 0) extremes(i) = v
                  }
              }
              i += 1
            }
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()
    row = new GenericInternalRow(specs.zipWithIndex.map {
      case (AggCountStar | AggCount(_), i) => counts(i): Any
      case (_, i) => extremes(i)
    }.toArray)
    emitted = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Streams one JSON-lines file, converting each line to an InternalRow
  * of exactly the pruned schema. Pushed filters run on the parsed JSON
  * node BEFORE conversion — filter columns need not survive pruning,
  * and rejected lines never become rows. */
class FeedstockPartitionReader(file: String, required: StructType,
    full: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter], limit: Int,
    conf: Configuration)
    extends PartitionReader[InternalRow] {
  private var emitted = 0
  private val mapper = new ObjectMapper()
  // resolved paths + typed literals, once per reader, not per line
  private val preds = pushed.map(FeedstockFilters.compile(_, full))
  private val path = new Path(file)
  private val in = path.getFileSystem(conf).open(path)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    // pushed LIMIT: stop reading the file once this partition has
    // produced its cap — lines past it are never parsed
    if (limit >= 0 && emitted >= limit) { row = null; return false }
    var node: JsonNode = null
    var done = false
    while (!done) {
      var line = reader.readLine()
      while (line != null && line.trim.isEmpty) line = reader.readLine()
      if (line == null) { node = null; done = true }
      else {
        node = mapper.readTree(line)
        if (preds.forall(_(node)))
          done = true
      }
    }
    if (node == null) { row = null; false }
    else { row = FeedstockPartitionReader.convert(node, required); emitted += 1; true }
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

object FeedstockPartitionReader {
  def convert(node: JsonNode, st: StructType): InternalRow =
    new GenericInternalRow(st.fields.map { f =>
      toCatalyst(if (node == null) null else node.get(f.name), f.dataType)
    }.asInstanceOf[Array[Any]])

  private def toCatalyst(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case s: StructType => convert(n, s)
      case ArrayType(et, _) =>
        val vs = new Array[Any](n.size())
        var i = 0
        while (i < n.size()) { vs(i) = toCatalyst(n.get(i), et); i += 1 }
        new GenericArrayData(vs): ArrayData
      case leaf => FeedstockLeaf.coerce(n, leaf)
    }
}
