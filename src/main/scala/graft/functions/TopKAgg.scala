package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate over (score: double, id: bigint)
  * candidate rows: per group, keep the k lexicographically smallest
  * (ascending=true) or largest (ascending=false) pairs under the SAME
  * total order Spark's `array_sort` / window `orderBy` use for
  * (double, long) structs — `java.lang.Double.compare` (NaN above
  * everything; -0.0 is normalized to 0.0 on insert, mirroring
  * UnsafeRow) then `java.lang.Long.compare` — so the
  * output array is value-identical to
  * `slice(array_sort(collect_list(struct(score, id))), 1, k)` (or its
  * `reverse` twin), which TopKAggSpec pins on adversarial inputs.
  *
  * Why an imperative aggregate: the declarative chain buffers EVERY
  * candidate per group — in the streaming ANN probes that is
  * O(nprobe·cell) structs per in-flight query held in the state store
  * and shuffled to it. This summary is O(k) state per group, updates
  * map-side (partial ObjectHashAggregate caps each partition's
  * contribution at k before the exchange), and merges like any
  * mergeable summary — the exchange and the state store carry at most
  * k pairs per query no matter how many candidates a probe generates.
  *
  * Exact duplicates — identical (score-bits, id) pairs, which the
  * banded Hamming probe produces when a candidate matches on several
  * bands — collapse on insert, replicating `collect_set` semantics; a
  * duplicate of an evicted element is strictly outside the kept k, so
  * eviction order cannot resurrect one. Output:
  * array<struct<score: double, id: bigint>> in kept order.
  */
case class TopKScoreIdAgg(
    score: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  require(k >= 1, "graft_topk k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk needs (double, bigint), got (${s.catalogString}, ${i.catalogString})")
    }

  /** Spark's struct order for (double, long): NaN-largest doubles,
    * then ids; negated when keeping the largest k. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    val cmp = if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    if (ascending) cmp < 0 else cmp > 0
  }

  private def eq(a: (Double, Long), b: (Double, Long)): Boolean =
    java.lang.Double.compare(a._1, b._1) == 0 && a._2 == b._2

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty[(Double, Long)]

  /** Insert preserving kept order; O(k) scan — k is small by design.
    * A duplicate can only sit at the first not-less position (the
    * order is strict), so one equality check there suffices. */
  private def insert(buf: mutable.ArrayBuffer[(Double, Long)],
      e: (Double, Long)): Unit = {
    var i = 0
    while (i < buf.length && lt(buf(i), e)) i += 1
    if (i < buf.length && eq(buf(i), e)) return
    if (i < k) {
      buf.insert(i, e)
      if (buf.length > k) buf.remove(k)
    }
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val raw = s.asInstanceOf[Double]
      // UnsafeRow normalizes -0.0 to 0.0 (and NaN to one canonical NaN)
      // before Spark's grouping/set semantics see the value; replicate
      // so the summary is identical whether its input arrived through
      // an unsafe projection or a raw interpreted row
      val sv = if (raw.isNaN) Double.NaN else if (raw == 0.0) 0.0 else raw
      insert(buf, (sv, i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    val rows = buf.map { case (s, i) => InternalRow(s, i): Any }
    new GenericArrayData(rows.toArray): ArrayData
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) {
      buf += ((bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKScoreIdAgg =
    copy(score = newChildren(0), id = newChildren(1))
}
