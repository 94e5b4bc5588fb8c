package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native element-wise vector sum over an `array<double>` column — the
  * aggregation primitive a centroid/embedding pipeline needs (means are
  * sum / count at the call site).
  *
  * Why an imperative aggregate: the declarative route to a per-group
  * vector mean is posexplode → groupBy(group, pos) → avg → re-assemble,
  * which amplifies the shuffled row count by the dimensionality (64× for
  * these embeddings) and needs a second shuffle to rebuild the array.
  * Here the per-group state is one Array[Double](dim) updated in a tight
  * scalar loop and merged by vector add: one ObjectHashAggregate with
  * map-side partials, no row amplification, no reassembly.
  */
case class VectorSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vecsum"

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum needs array<double>, got ${t.catalogString}")
  }

  /** Dimension is learned from the first non-null input row. */
  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length == n) buf else new Array[Double](n)
    var i = 0
    while (i < n) { acc(i) += arr.getDouble(i); i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(vec = newChildren(0))
}
