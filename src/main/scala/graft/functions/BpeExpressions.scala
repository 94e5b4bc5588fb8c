package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer model: an ordered merge list (the
  * standard BPE artifact — Sennrich et al., arXiv:1508.07909) plus the
  * greedy encoder that applies it.
  *
  * The model is a VALUE that ships inside the expression tree
  * (broadcast with the task closure, like a join's small side): at
  * 100 TB the tokenizer is a few-hundred-KB constant and encoding is a
  * pure per-row map — no shuffle, no join, scan speed.
  *
  * Encoding is the canonical greedy loop: repeatedly find the
  * lowest-rank adjacent token pair in the word and merge every
  * non-overlapping occurrence left-to-right, until no adjacent pair is
  * in the merge table. Because [[graft.operators.BpeOps.trainMerges]]
  * guarantees every produced token string is UNIQUE (it skips candidate
  * pairs whose concatenation collides with an existing token), the
  * greedy loop is provably equivalent to replaying the merge list in
  * rank order to a fixpoint — which is exactly what the DuckDB oracle
  * does with delimiter-joined `replace` rounds, so the two engines are
  * comparable merge by merge.
  *
  * Words repeat enormously in natural corpora (Zipf), so encoded words
  * are memoized per executor in a bounded cache — the same trick every
  * production BPE implementation uses.
  */
final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
  /** adjacent-token pair, NUL-joined (no collision with token text)
    * → rank (lower merges first). */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private final val CacheCap = 1 << 16

  /** Greedy BPE merge loop over one word (chars → tokens). The initial
    * split is by Unicode CODE POINT (surrogate pairs stay whole) — the
    * same units DuckDB's `string_split(w, '')` produces, so the oracle
    * CTE and the engine segment identically on any input, and the
    * byte-fallback id tier sees whole code points to decompose. */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var toks: Array[String] = BpeModel.codePointTokens(word)
    var done = false
    while (!done && toks.length > 1) {
      // lowest-rank adjacent pair present in the word
      var best = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + "\u0000" + toks(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bestA = toks(i); bestB = toks(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // merge every non-overlapping occurrence, left to right
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == bestA && toks(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
      }
    }
    if (cache.size > CacheCap) cache.clear()
    cache.put(word, toks)
    toks
  }

  /** Encode a pre-tokenized word array to the flat BPE token stream.
    * Null or empty words contribute nothing (a word has no characters
    * to pair). Called from generated code. */
  def encodeWords(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) {
          val toks = encodeWord(w)
          var j = 0
          while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

object BpeModel {
  /** Split a word into Unicode code points (a surrogate pair is ONE
    * token; a lone surrogate stays a 1-char token). */
  def codePointTokens(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }
}

/** `graft_bpe(words)` — flat BPE token stream of a pre-tokenized word
  * array, under the model captured at plan time. Pre-tokenization is
  * the caller's (split / regexp extraction), mirroring how production
  * tokenizers separate the pre-tokenizer from the merge loop. */
case class BpeEncode(child: Expression, model: BpeModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe needs array<string> words, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.encodeWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeWords($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe"
}

/** Dense token→id vocabulary riding the task closure next to the
  * model: alphabet entries first (sorted), merge products after in
  * rank order — the id layout every BPE implementation publishes.
  *
  * Out-of-vocabulary handling is two-tier:
  *  - `byteFallback = false`: OOV tokens map to -1 (the audit mode —
  *    `n_oov` counts out-of-distribution text);
  *  - `byteFallback = true`: the GPT-2 recipe — 256 byte ids extend
  *    the id space at `vocab.size + b`, and an OOV token decomposes
  *    into the UTF-8 bytes of its (single-code-point) text, so NO
  *    token is ever dropped: every byte of every document is
  *    representable and [[decodeBytes]] reproduces the input
  *    byte-for-byte (property-pinned on arbitrary unicode). */
final case class BpeIdMap(vocab: Seq[(String, Int)],
    byteFallback: Boolean = false) extends Serializable {
  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
    m
  }

  @transient private lazy val tokenById: Array[String] = {
    val a = new Array[String](vocab.size)
    vocab.foreach { case (t, i) => a(i) = t }
    a
  }

  /** First id of the byte tier: byte b is id `byteBase + b`. */
  val byteBase: Int = vocab.size

  def idOf(token: String): Int = {
    val v = ids.get(token)
    if (v == null) -1 else v.intValue()
  }

  /** Map a token-string array to its id array. With [[byteFallback]],
    * an OOV token expands to one id per UTF-8 byte (the output can be
    * longer than the input). Called from generated code. */
  def mapIds(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (!byteFallback) {
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = idOf(toks.getUTF8String(i).toString)
        i += 1
      }
      ArrayData.toArrayData(out)
    } else {
      val out = new scala.collection.mutable.ArrayBuffer[Int](n)
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i).toString
        val v = ids.get(t)
        if (v != null) out += v.intValue()
        else {
          val bs = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var j = 0
          while (j < bs.length) { out += byteBase + (bs(j) & 0xff); j += 1 }
        }
        i += 1
      }
      ArrayData.toArrayData(out.toArray)
    }
  }

  /** Decode an id stream back to bytes — in-vocab ids contribute their
    * token's UTF-8 bytes, byte-tier ids contribute their byte. Because
    * BPE merges partition each word, the decoded bytes of an encoded
    * word equal the word's own UTF-8 bytes exactly. */
  def decodeBytes(idStream: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    idStream.foreach { id =>
      if (id >= byteBase) out.write(id - byteBase)
      else if (id >= 0) out.write(
        tokenById(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else throw new IllegalArgumentException(
        "cannot decode OOV id -1; encode with byteFallback = true")
    }
    out.toByteArray
  }
}

/** `graft_bpe_ids(words)` — the BPE id stream: encode, then map each
  * token through the dense vocabulary. Same zero-shuffle scan shape as
  * [[BpeEncode]]; this is the column a training shard actually stores
  * (int ids for the embedding table, not strings). */
case class BpeEncodeIds(child: Expression, model: BpeModel, ids: BpeIdMap)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_ids needs array<string> words, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ids.mapIds(model.encodeWords(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refM = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    val refV = ctx.addReferenceObj("bpeIds", ids, classOf[BpeIdMap].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $refV.mapIds($refM.encodeWords($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_ids"
}
