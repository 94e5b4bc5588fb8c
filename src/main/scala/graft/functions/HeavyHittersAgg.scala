package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native SpaceSaving (Metwally et al. 2005) heavy-hitters aggregate:
  * per group, a bounded summary of at most `capacity` (key, count,
  * err) counters over a 64-bit key stream. The classic frequent-items
  * guarantees hold regardless of input order or partitioning:
  *
  *   - COVERAGE: every key with true frequency > n / capacity is in
  *     the summary (n = total items seen);
  *   - OVERESTIMATE-ONLY: reported count ≥ true count, and the
  *     per-key `err` bounds the overshoot (count − err ≤ true).
  *
  * Why an imperative aggregate: the exact alternative is a full
  * groupBy over the key domain — a shuffle proportional to the
  * DISTINCT key count, which for web-scale token streams is the
  * dominant cost. This summary is O(capacity) state per group, updates
  * map-side in O(1) amortized (hash lookup + min eviction against a
  * lazily rebuilt min), and merges like any mergeable summary (sum
  * shared counters, keep the top `capacity`, fold the dropped tail
  * into `err`) — so a corpus-wide top-k costs one
  * ObjectHashAggregate with no key-domain shuffle at all.
  *
  * The exact SUMMARY CONTENT depends on arrival/merge order (inherent
  * to the sketch), so the output is spec-gated on its guarantees
  * rather than hash-compared: HeavyHittersSpec checks coverage and
  * the overestimate bound against exact counts, across repartitioned
  * inputs. Output: array<struct<key:bigint, count:bigint,
  * err:bigint>> sorted by (count desc, key asc).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[mutable.LongMap[(Long, Long)]] {

  require(capacity >= 1, "graft_heavy_hitters capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters needs bigint keys, got ${t.catalogString}")
  }

  // state: key -> (count, err)
  override def createAggregationBuffer(): mutable.LongMap[(Long, Long)] =
    mutable.LongMap.empty[(Long, Long)]

  private def evictMin(buf: mutable.LongMap[(Long, Long)]): (Long, Long) = {
    // O(capacity) scan on eviction only — capacity is small by design
    var minKey = 0L
    var minCount = Long.MaxValue
    buf.foreachEntry { (k, v) =>
      if (v._1 < minCount || (v._1 == minCount && k < minKey)) {
        minKey = k; minCount = v._1
      }
    }
    buf.remove(minKey)
    (minKey, minCount)
  }

  override def update(buf: mutable.LongMap[(Long, Long)], input: InternalRow): mutable.LongMap[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buf.get(k) match {
        case Some((c, e)) => buf.update(k, (c + 1, e))
        case None if buf.size < capacity => buf.update(k, (1L, 0L))
        case None =>
          val (_, minCount) = evictMin(buf)
          // SpaceSaving: the newcomer inherits the evicted minimum as
          // its (over)count and error bound
          buf.update(k, (minCount + 1, minCount))
      }
    }
    buf
  }

  private def minCountOf(buf: mutable.LongMap[(Long, Long)]): Long = {
    var minCount = Long.MaxValue
    buf.foreachEntry { (_, v) => if (v._1 < minCount) minCount = v._1 }
    minCount
  }

  override def merge(buf: mutable.LongMap[(Long, Long)], other: mutable.LongMap[(Long, Long)]): mutable.LongMap[(Long, Long)] = {
    // mergeable-summaries combine (Agarwal et al. 2013): a key ABSENT
    // from an at-capacity side may still have occurred up to that
    // side's minimum counter there (it could have been evicted), so
    // the conservative combine credits the absent side's minimum to
    // BOTH count and err. A side below capacity never evicted, so
    // absence there really means zero — no credit. Only after this
    // does the top-`capacity` cut run; the overestimate and coverage
    // guarantees then survive any partitioning/merge order.
    if (other.isEmpty) return buf // common case: empty partial, zero-copy
    val minBuf = if (buf.size >= capacity) minCountOf(buf) else 0L
    val minOther = if (other.size >= capacity) minCountOf(other) else 0L
    val out = mutable.LongMap.empty[(Long, Long)]
    buf.foreachEntry { (k, v) =>
      other.get(k) match {
        case Some((c2, e2)) => out.update(k, (v._1 + c2, v._2 + e2))
        case None => out.update(k, (v._1 + minOther, v._2 + minOther))
      }
    }
    other.foreachEntry { (k, v) =>
      if (!buf.contains(k)) out.update(k, (v._1 + minBuf, v._2 + minBuf))
    }
    if (out.size > capacity) {
      val kept = out.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
      out.clear()
      kept.foreach { case (k, v) => out.update(k, v) }
    }
    out
  }

  override def eval(buf: mutable.LongMap[(Long, Long)]): Any = {
    val rows = buf.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        InternalRow(k, c, e): Any
      }
    new GenericArrayData(rows.toArray): ArrayData
  }

  override def serialize(buf: mutable.LongMap[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) =>
      bb.putLong(k); bb.putLong(v._1); bb.putLong(v._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[(Long, Long)]
    var i = 0
    while (i < n) {
      val k = bb.getLong; val c = bb.getLong; val e = bb.getLong
      buf.update(k, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
}
