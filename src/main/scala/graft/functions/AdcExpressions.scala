package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) against a codebook
  * grid riding the task closure — the BPE-encoder/ensemble-scorer
  * pattern: the trained artifact is a plan CONSTANT, not a join side.
  *
  * Inputs per row: the query's residual subvectors
  * (`array<array<double>>`, one slice per subspace) and a candidate's
  * code array (`array<int>`); `grid(subspace)(code)` is the codeword.
  * The sum replicates the higher-order
  * `aggregate(transform(...), l2sq)` fold EXACTLY — per-subspace
  * subtotals in index order, then an outer left fold — so swapping
  * the HOF chain for this expression changes no output bit. The HOF
  * chain evaluates interpreted (higher-order functions are not
  * codegen'd) and allocates per element; this is one allocation-free
  * JVM loop per candidate inside whole-stage codegen — the ADC probe's
  * per-candidate cost drops to a dot-product's.
  *
  * An out-of-range code yields NaN (sorts above everything, so the
  * candidate falls out of any ascending top-k) rather than throwing —
  * a corrupt index row degrades, the 100 TB object-store semantics.
  */
case class AdcDistance(left: Expression, right: Expression,
    grid: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc needs (array<array<double>>, array<int>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val rq = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = math.min(rq.numElements(), codes.numElements())
    var total = 0.0
    var j = 0
    while (j < m) {
      // null elements degrade like out-of-range codes: NaN, not an NPE
      // (the contract inputs never carry them, but a hand-built frame
      // with containsNull=true must not fail the job)
      if (codes.isNullAt(j) || rq.isNullAt(j)) return Double.NaN
      val code = codes.getInt(j)
      if (j >= grid.length || code < 0 || code >= grid(j).length)
        return Double.NaN
      val sub = rq.getArray(j)
      val cw = grid(j)(code)
      val n = math.min(sub.numElements(), cw.length)
      var s = 0.0
      var d = 0
      while (d < n) {
        val diff = sub.getDouble(d) - cw(d)
        s += diff * diff
        d += 1
      }
      total += s
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gridRef = ctx.addReferenceObj("adcGrid", grid, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val code = ctx.freshName("code")
      val sub = ctx.freshName("sub")
      val cw = ctx.freshName("cw")
      val total = ctx.freshName("total")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $total = 0.0;
         |boolean $bad = false;
         |for (int $j = 0; $j < $m && !$bad; $j++) {
         |  if ($b.isNullAt($j) || $a.isNullAt($j)) { $bad = true; continue; }
         |  int $code = $b.getInt($j);
         |  if ($j >= $gridRef.length || $code < 0 || $code >= $gridRef[$j].length) {
         |    $bad = true;
         |  } else {
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub = $a.getArray($j);
         |    double[] $cw = $gridRef[$j][$code];
         |    int $n = java.lang.Math.min($sub.numElements(), $cw.length);
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      double $diff = $sub.getDouble($d) - $cw[$d];
         |      $s += $diff * $diff;
         |    }
         |    $total += $s;
         |  }
         |}
         |${ev.value} = $bad ? Double.NaN : $total;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc"
}
