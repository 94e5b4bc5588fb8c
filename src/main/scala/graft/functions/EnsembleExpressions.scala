package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full CCNet/RefinedWeb quality-ensemble gate as ONE native
  * per-row scorer — the ingest-speed shape of
  * [[graft.operators.QualityModelOps.qualityEnsemble]].
  *
  * Every trained artifact (the bigram-LM count tables, the DSIR bucket
  * model, the per-language perplexity cutoffs) is collapsed into a
  * value that ships inside the expression tree — the
  * [[graft.functions.BpeModel]] pattern: at production scale the
  * models are a few MB of standing artifact riding the task closure
  * like a broadcast small side, and scoring a document is one JVM
  * loop with O(1) hash-map probes per feature. No explode, no joins,
  * no aggregation state: the streaming gate becomes a stateless
  * projection that runs at scan speed on every executor.
  *
  * Semantics are the batch gate's, signal by signal (the spec pins
  * verdict rows identical to [[graft.operators.QualityModelOps
  * .qualityEnsemble]]):
  *  - Gopher shape rules and the repetition flag mirror
  *    [[TextFunctions.gopherStructCol]] / `repetitionStructCol`
  *    (space-only trim, Java-regex `\s+` split, code-point lengths,
  *    three-valued `flagged` when a doc has no bigram).
  *  - The LM mean-log-prob folds per-distinct-bigram terms in the
  *    batch operator's sorted (cb0, cw0, m) order, so the rounded
  *    score is BIT-IDENTICAL to [[graft.operators.QualityModelOps
  *    .lmPerplexity]], not merely 1e-9-close.
  *  - The DSIR weight folds per-bucket multiplicities against the
  *    model's log ratios in bucket-index order (deterministic; the
  *    sign of the 6dp-rounded sum is the verdict, as in the batch
  *    and join-shape scorers).
  */
final case class EnsembleArtifacts(
    cbPairs: Array[(String, Long)],
    cwPairs: Array[(String, Long)],
    dsirLogRatio: Array[Double],
    cutTriples: Array[(String, Double, Double)]) extends Serializable {
  require(dsirLogRatio.length == 256, "DSIR model must cover all 256 buckets")

  /** context-vocabulary size: the cw row count, exactly like the
    * streaming scorers' `cw.agg(count(1))`. */
  val v: Long = cwPairs.length.toLong

  @transient private lazy val cb: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](cbPairs.length * 2)
    cbPairs.foreach { case (k, c) => m.put(k, java.lang.Long.valueOf(c)) }
    m
  }

  @transient private lazy val cw: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](cwPairs.length * 2)
    cwPairs.foreach { case (k, c) => m.put(k, java.lang.Long.valueOf(c)) }
    m
  }

  @transient private lazy val cuts: java.util.HashMap[String, (Double, Double)] = {
    val m = new java.util.HashMap[String, (Double, Double)](cutTriples.length * 2)
    cutTriples.foreach { case (l, lo, hi) => m.put(l, (lo, hi)) }
    m
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.qualityStopwords.foreach(s.add)
    s
  }

  @transient private lazy val md5Local =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's `trim`: spaces (0x20) only, both ends. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def hasAlpha(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) return true
      i += 1
    }
    false
  }

  private val space = ' '.toByte

  /** md5(feature)'s first two hex chars ARE its first byte — the DSIR
    * bucket index without materializing the hex string. */
  private def bucketOf(md: MessageDigest, a: String, b: String): Int = {
    md.reset()
    md.update(a.getBytes(StandardCharsets.UTF_8))
    if (b != null) {
      md.update(space)
      md.update(b.getBytes(StandardCharsets.UTF_8))
    }
    md.digest()(0) & 0xff
  }

  private val unscored = UTF8String.fromString("unscored")
  private val head = UTF8String.fromString("head")
  private val middle = UTF8String.fromString("middle")
  private val tail = UTF8String.fromString("tail")

  /** Score one document; called from generated code. `langU` may be
    * null (a missing language buckets to `tail` like the batch gate's
    * unmatched left join). */
  def score(textU: UTF8String, langU: UTF8String): InternalRow = {
    val text = textU.toString
    val trimmed = trimSpaces(text)
    val ws = trimmed.split("\\s+", -1)
    val nWords = ws.length
    val nW = nWords.toDouble

    // ---- Gopher shape rules (TextFunctions.gopherStructCol)
    var nAlpha = 0
    val distinct = new java.util.HashSet[String](nWords * 2)
    var nStop = 0
    var i = 0
    while (i < nWords) {
      val w = ws(i)
      if (hasAlpha(w)) nAlpha += 1
      if (distinct.add(w) && stopSet.contains(w)) nStop += 1
      i += 1
    }
    val noWsStr = trimmed.replaceAll("\\s+", "")
    val noWs = noWsStr.codePointCount(0, noWsStr.length)
    var nSymbols = 0
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#' || c == '…') nSymbols += 1
      i += 1
    }
    val meanWordLen = noWs / nW
    val gopherKeep = (nWords >= 50 && nWords <= 100000) &&
      (meanWordLen >= 3.0 && meanWordLen <= 10.0) &&
      (nAlpha / nW >= 0.8) && (nSymbols / nW <= 0.1) && nStop >= 2

    // ---- repetition flag (TextFunctions.repetitionStructCol), with
    // the batch three-valued semantics when the doc has no bigram
    val dupFrac = 1.0 - distinct.size / nW
    val nBigrams = if (nWords >= 2) nWords - 1 else 0
    val md = md5Local.get()

    // one pass builds the distinct-bigram multiplicities (repetition +
    // LM) and the DSIR bucket histogram (unigrams ++ bigrams)
    val bgCounts = new java.util.HashMap[String, Array[Long]](nBigrams * 2)
    val buckets = new Array[Long](256)
    i = 0
    while (i < nWords) {
      buckets(bucketOf(md, ws(i), null)) += 1L
      if (i < nWords - 1) {
        buckets(bucketOf(md, ws(i), ws(i + 1))) += 1L
        val bg = ws(i) + " " + ws(i + 1)
        val slot = bgCounts.get(bg)
        if (slot == null) bgCounts.put(bg, Array(1L)) else slot(0) += 1L
      }
      i += 1
    }

    var repFlag: java.lang.Boolean = null
    if (dupFrac > TextFunctions.dupWordFracMax) repFlag = java.lang.Boolean.TRUE
    else if (nBigrams >= 1) {
      var maxMult = 0L
      val it0 = bgCounts.values().iterator()
      while (it0.hasNext) {
        val m = it0.next()(0)
        if (m > maxMult) maxMult = m
      }
      repFlag = java.lang.Boolean.valueOf(
        maxMult.toDouble / nBigrams > TextFunctions.topBigramFracMax)
    }

    // ---- LM mean log-prob: the batch operator's exact sorted fold
    // over per-distinct-bigram (cb0, cw0, m) terms
    var bucket: UTF8String = tail
    if (nBigrams == 0) bucket = unscored
    else {
      val terms = new Array[(Long, Long, Long)](bgCounts.size())
      val it = bgCounts.entrySet().iterator()
      i = 0
      while (it.hasNext) {
        val e = it.next()
        val bg = e.getKey
        val cb0 = cb.get(bg)
        val sp = bg.indexOf(' ')
        val cw0 = cw.get(bg.substring(0, sp))
        terms(i) = (if (cb0 == null) 0L else cb0.longValue(),
          if (cw0 == null) 0L else cw0.longValue(), e.getValue()(0))
        i += 1
      }
      java.util.Arrays.sort(terms, Ordering[(Long, Long, Long)])
      var lp = 0.0
      i = 0
      while (i < terms.length) {
        val t = terms(i)
        lp += t._3.toDouble * (Math.log(t._1 + 1.0) - Math.log((t._2 + v).toDouble))
        i += 1
      }
      val mlp = round6(lp / nBigrams)
      val cut = if (langU == null) null else cuts.get(langU.toString)
      if (cut != null) {
        if (mlp >= cut._2) bucket = head
        else if (mlp >= cut._1) bucket = middle
      }
    }

    // ---- DSIR target-likeness: bucket-index-order fold of the
    // broadcast log ratios (deterministic; sign of the 6dp sum)
    var lw = 0.0
    i = 0
    while (i < 256) {
      if (buckets(i) > 0L) lw += buckets(i).toDouble * dsirLogRatio(i)
      i += 1
    }
    val targetLike = round6(lw) > 0.0

    // ---- keep: three-valued conjunction, exactly Spark's && chain
    val notTail = !bucket.equals(tail)
    val keep: java.lang.Boolean =
      if (!gopherKeep || !notTail || (repFlag != null && repFlag.booleanValue()))
        java.lang.Boolean.FALSE
      else if (repFlag == null) null
      else java.lang.Boolean.TRUE

    new GenericInternalRow(Array[Any](gopherKeep, repFlag, bucket, targetLike, keep))
  }
}

object EnsembleArtifacts {
  /** Collapse the trained standing frames into the closure value —
    * vocabulary-sized artifact loads, the [[graft.ArtifactStore]]
    * class of driver-side collect (bounded by the trained model, never
    * by the corpus). `cb`/`cw` are [[graft.operators.QualityModelOps
    * .lmModelOf]]'s tables, `pplCuts` is `pplCutsOf`, `dsirModel` is
    * `dsirModelOf` (its 256-bucket spine is required). */
  def of(cb: org.apache.spark.sql.DataFrame, cw: org.apache.spark.sql.DataFrame,
      pplCuts: org.apache.spark.sql.DataFrame,
      dsirModel: org.apache.spark.sql.DataFrame): EnsembleArtifacts = {
    val cbP = cb.select("bg", "cb").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cwP = cw.select("w1", "cw").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val lr = new Array[Double](256)
    dsirModel.select("bucket", "log_ratio").collect().foreach { r =>
      lr(Integer.parseInt(r.getString(0), 16)) = r.getDouble(1)
    }
    val cutsP = pplCuts.select("lang", "c_low", "c_high").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    EnsembleArtifacts(cbP, cwP, lr, cutsP)
  }
}

/** `graft_quality_ensemble(text, lang)` — the per-document quality
  * verdict struct under the artifacts captured at plan time. Null text
  * yields a null struct (the gates' contract is text non-null); null
  * lang scores with no perplexity cutoffs, like the batch left join. */
case class QualityEnsembleScore(left: Expression, right: Expression,
    artifacts: EnsembleArtifacts) extends BinaryExpression {

  override def dataType: DataType = QualityEnsembleScore.schema

  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_quality_ensemble needs (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else artifacts.score(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ensembleArtifacts", artifacts,
      classOf[EnsembleArtifacts].getName)
    val tEv = left.genCode(ctx)
    val lEv = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${tEv.code}
        ${lEv.code}
        boolean ${ev.isNull} = ${tEv.isNull};
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.score(${tEv.value},
            ${lEv.isNull} ? null : ${lEv.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QualityEnsembleScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_quality_ensemble"
}

object QualityEnsembleScore {
  val schema: StructType = StructType(Seq(
    StructField("gopher_keep", BooleanType, nullable = false),
    StructField("rep_flag", BooleanType, nullable = true),
    StructField("ppl_bucket", StringType, nullable = false),
    StructField("target_like", BooleanType, nullable = false),
    StructField("keep", BooleanType, nullable = true)))
}
