package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DSIR feature-bucket counts as ONE native pass — the
  * hot loop of [[graft.operators.QualityModelOps.dsirWeights]].
  *
  * Value-identical to the interpreted chain
  * `explode(featuresCol) -> substring(md5(f), 1, 2) -> groupBy count`
  * where featuresCol = unigrams ++ adjacent bigrams of
  * `split(trim(text), "\s+")` (spec-pinned in DsirBucketsSpec): the
  * bucket of a feature is the first byte of its md5 digest — exactly
  * the integer the two hex chars `substring(md5(f), 1, 2)` spell —
  * and `m` is the feature multiplicity of that bucket in the document.
  *
  * The interpreted form allocates every unigram/bigram as a fresh
  * UTF8String, explodes ~2·|words| rows per document, and re-groups
  * them; this form is one token split, one md5 per feature digested
  * straight from reused byte buffers, and a 256-slot count array per
  * document — no feature strings, no per-feature rows, no
  * (doc, bucket) pre-aggregation exchange. Output is the compact
  * (bucket, m) list sorted by bucket, one row per populated bucket.
  */
case class Md5BucketCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("m", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_bucket_counts needs a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5BucketCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5BucketCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5BucketCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_bucket_counts"
}

object Md5BucketCounts {
  // one digest instance per thread — getInstance per row would dominate
  // the per-feature work this expression exists to remove
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // compiled once, same pattern discipline as WindowHashes
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Space = Array(' '.toByte)

  def compute(s: UTF8String): ArrayData = {
    // replicate split(trim(text), "\s+") exactly: Spark's trim strips
    // the space character only, then Java-regex split with limit -1
    // (split's default), which KEEPS a leading/trailing empty token a
    // non-space separator produces and yields [""] for an empty string
    val str = s.toString
    var b0 = 0
    var e0 = str.length
    while (b0 < e0 && str.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && str.charAt(e0 - 1) == ' ') e0 -= 1
    val toks = Whitespace.split(str.substring(b0, e0), -1)
    val tb = new Array[Array[Byte]](toks.length)
    var j = 0
    while (j < toks.length) {
      tb(j) = toks(j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      j += 1
    }
    val counts = new Array[Long](256)
    val md = md5.get()
    // unigram features
    j = 0
    while (j < tb.length) {
      md.reset()
      md.update(tb(j))
      counts(md.digest()(0) & 0xff) += 1
      j += 1
    }
    // adjacent-bigram features, only for documents with >= 2 tokens
    // (the interpreted bigramsOf guard)
    j = 0
    while (j + 1 < tb.length) {
      md.reset()
      md.update(tb(j)); md.update(Space); md.update(tb(j + 1))
      counts(md.digest()(0) & 0xff) += 1
      j += 1
    }
    var nonzero = 0
    j = 0
    while (j < 256) { if (counts(j) > 0) nonzero += 1; j += 1 }
    val rows = new Array[Any](nonzero)
    var out = 0
    j = 0
    while (j < 256) {
      if (counts(j) > 0) {
        rows(out) = InternalRow(j, counts(j))
        out += 1
      }
      j += 1
    }
    new GenericArrayData(rows)
  }
}
