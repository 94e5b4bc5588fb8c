package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of word n-gram shingles, as one native pass.
  *
  * Semantics are identical to the declarative chain
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(" ",
  * w[i], ..., w[i+n-1]))))` over `split(text, " ")`: words are the
  * single-space-separated tokens (empty tokens included, exactly like
  * `split`), and each shingle hash is the xxhash64 (seed 42, Spark's
  * default) of the byte span covering its n words — which is byte-equal
  * to the `concat_ws(" ", ...)` string because the separators in the
  * source text ARE single spaces. Shingling is the hot inner loop of
  * every text-dedup operator (n-gram Jaccard, MinHash, contamination);
  * the higher-order-function form evaluates an interpreted expression
  * tree per shingle, this form is one tight JVM loop per document inside
  * whole-stage codegen with zero string materialization.
  *
  * Output order is ascending by hash (sort-dedup); every consumer
  * (explode → groupBy, array_min folds, set intersection) is
  * order-insensitive.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object ShingleHashes {
  /** Seed used by Spark's `xxhash64` function. */
  final val Seed = 42L

  /** One pass over the UTF-8 bytes: find the single-space word
    * boundaries, hash the byte span of each n-word window, sort-dedupe.
    * Returns an empty array when the document has fewer than n words. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // word j spans [starts(j), ends(j)) in byte offsets
    var words = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' '.toByte) words += 1
      i += 1
    }
    if (words < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (s.getByte(i) == ' '.toByte) {
        ends(w) = i
        w += 1
        starts(w) = i + 1
      }
      i += 1
    }
    ends(w) = len
    val m = words - n + 1
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) {
      val a = starts(j)
      val b = ends(j + n - 1)
      hs(j) = XXH64.hashUnsafeBytes(base, off + a, b - a, Seed)
      j += 1
    }
    java.util.Arrays.sort(hs)
    // in-place unique on the sorted array
    var out = 0
    j = 0
    while (j < m) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(out) = hs(j); out += 1 }
      j += 1
    }
    ArrayData.toArrayData(if (out == m) hs else java.util.Arrays.copyOf(hs, out))
  }
}

/** k-minimum MinHash signature over a document's shingle-hash set.
  *
  * Replicates the declarative chain
  * `array(min(transform(hx, x -> pmod(x*a_i + b_i, M))) for i < k)` with
  * `hx = pmod(h, M)` and M = 2^31-1 — bit-identical results — but in one
  * k×|hs| JVM loop instead of k interpreted array traversals per row.
  * The permutation constants are the same public LCG-derived values the
  * declarative form used.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // an empty hash set has no minimum under any permutation → null
  // signature, matching the declarative `min(...)`-over-empty chain
  // (never a sentinel that could band-collide with other empty docs)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSignature.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSignature {
  final val Mersenne = 2147483647L
  private final val MaxK = 64
  /** Deterministic permutation parameters (public LCG constants); must
    * stay in lockstep with DedupOps' documented values. */
  private val permA: Array[Long] =
    Array.tabulate(MaxK)(i => ((1103515245L * (i + 1) + 12345L) % Mersenne) | 1L)
  private val permB: Array[Long] =
    Array.tabulate(MaxK)(i => (7919L * (i + 37) + 104729L) % Mersenne)

  def a(i: Int): Long = permA(i)
  def b(i: Int): Long = permB(i)

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  def compute(hs: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"minhash k capped at $MaxK")
    val n = hs.numElements()
    if (n == 0) return null // no shingles → no signature (see nullable)
    val hx = new Array[Long](n)
    var j = 0
    while (j < n) { hx(j) = pmod(hs.getLong(j), Mersenne); j += 1 }
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val ai = permA(i)
      val bi = permB(i)
      var best = Long.MaxValue
      j = 0
      while (j < n) {
        val v = pmod(hx(j) * ai + bi, Mersenne)
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    ArrayData.toArrayData(sig)
  }
}
