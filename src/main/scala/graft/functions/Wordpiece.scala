package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first ("MaxMatch") subword segmentation — the
  * WordPiece inference rule (Wu et al. 2016 §3.1; the segmenter BERT
  * ships) over a FLAT vocabulary, continuation markers omitted: at each
  * cursor position emit the longest vocabulary token that prefixes the
  * remaining word; an uncovered character falls back to itself (an
  * identity "[UNK]" that keeps the fold total and, unlike an opaque UNK
  * id, cross-engine reproducible).
  *
  * This is a genuinely different segmenter from [[Bpe.encodeWord]]'s
  * merge-rank fold — greedy can undercut BPE (vocab {a,b,ab,ba}, merges
  * [(b,a),(a,b)]: BPE("abab") = [a,ba,b], greedy = [ab,ab]) — which is
  * exactly what the wordpiece_tokens panel measures corpus-wide.
  *
  * The hot loop is a native codegen kernel: vocabulary tokens ride the
  * expression as literals (≤ merges + alphabet entries, the
  * broadcast-for-free shape [[BpeEncode]] uses), bucketed by length so a
  * position probes one hash set per candidate length, longest first.
  */
object Wordpiece {

  /** Greedy longest-match segmentation of one word. `vocabByLen(k)` holds
    * the vocab tokens of length k+1 (index 0 = single chars). */
  def segment(word: String, vocabByLen: Array[java.util.HashSet[String]]): Array[String] = {
    val n = word.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      var len = math.min(vocabByLen.length, n - i)
      var hit: String = null
      while (hit == null && len >= 1) {
        val cand = word.substring(i, i + len)
        if (vocabByLen(len - 1).contains(cand)) hit = cand
        else len -= 1
      }
      if (hit == null) { out += word.substring(i, i + 1); i += 1 }
      else { out += hit; i += hit.length }
    }
    out.toArray
  }

  def wordpieceEncode(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordpieceEncode(ColumnBridge.expression(word), vocab))

  /** Minimum number of tokens over ALL segmentations of `word` under the
    * vocabulary (single-char fallback always available, mirroring
    * [[segment]]): the shortest-tokenization DP — best(i) = min over
    * tokens t ending at i of best(i−|t|) + 1. The lower bound greedy
    * MaxMatch is measured against. */
  def minTokens(word: String, vocabByLen: Array[java.util.HashSet[String]]): Long = {
    val n = word.length
    if (n == 0) return 0L
    val best = Array.fill(n + 1)(Long.MaxValue)
    best(0) = 0L
    var i = 0
    while (i < n) {
      if (best(i) != Long.MaxValue) {
        // single-char fallback keeps the DP total even off-vocabulary
        if (best(i) + 1 < best(i + 1)) best(i + 1) = best(i) + 1
        var len = math.min(vocabByLen.length, n - i)
        while (len >= 1) {
          if (vocabByLen(len - 1).contains(word.substring(i, i + len))
              && best(i) + 1 < best(i + len)) best(i + len) = best(i) + 1
          len -= 1
        }
      }
      i += 1
    }
    best(n)
  }

  def minTokensEncode(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(MinTokensEncode(ColumnBridge.expression(word), vocab))

  /** Combined-score scale for [[viterbiScore]]: score = cost·SCALE +
    * ntok. Because every token contributes cost·SCALE + 1 additively,
    * minimizing the scalar IS the lexicographic (total cost, token
    * count) minimum — one DP, deterministic tie-break, and the DuckDB
    * twin recovers both components with `// SCALE` and `% SCALE`.
    * Safe while ntok < SCALE (words are bounded far below 10⁶ chars)
    * and total cost < 2⁶³/SCALE. */
  val ViterbiScale = 1000000L

  /** Unigram-LM Viterbi segmentation score of one word under rank-based
    * integer token costs (Kudo 2018's Viterbi decode with -log p
    * replaced by frequency rank — order-preserving and integer-exact):
    * returns min over all segmentations of Σ (cost(t)·[[ViterbiScale]]
    * + 1). `costByLen(k)` maps tokens of length k+1 to their cost; a
    * single character NOT in the vocabulary advances at `fallback`
    * cost (never triggered when the vocab carries the corpus alphabet,
    * but keeps the DP total). */
  def viterbiScore(word: String,
      costByLen: Array[java.util.HashMap[String, java.lang.Long]],
      fallback: Long): Long = {
    val n = word.length
    if (n == 0) return 0L
    val inf = Long.MaxValue / 4
    val best = Array.fill(n + 1)(inf)
    best(0) = 0L
    var i = 0
    while (i < n) {
      if (best(i) < inf) {
        var oneChar = false
        var len = math.min(costByLen.length, n - i)
        while (len >= 1) {
          val c = costByLen(len - 1).get(word.substring(i, i + len))
          if (c ne null) { // java.lang.Long: absent is a REAL null, never
            // an auto-unboxed 0 (which would zero-cost every substring)
            if (len == 1) oneChar = true
            val cand = best(i) + c.longValue() * ViterbiScale + 1L
            if (cand < best(i + len)) best(i + len) = cand
          }
          len -= 1
        }
        if (!oneChar) { // off-vocabulary character: fallback advance
          val cand = best(i) + fallback * ViterbiScale + 1L
          if (cand < best(i + 1)) best(i + 1) = cand
        }
      }
      i += 1
    }
    best(n)
  }

  def viterbiScoreEncode(word: Column, vocabCosts: Seq[(String, Long)],
      fallback: Long): Column =
    ColumnBridge.column(ViterbiScoreEncode(ColumnBridge.expression(word),
      vocabCosts, fallback))
}

/** Shortest-tokenization token COUNT under a learned flat vocabulary —
  * the optimum [[WordpieceEncode]]'s greedy walk is compared against. */
case class MinTokensEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_min_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string word, got ${other.simpleString}")
    }

  @transient private lazy val vocabByLen: Array[java.util.HashSet[String]] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val buckets = Array.fill(maxLen)(new java.util.HashSet[String]())
    vocab.foreach(t => if (t.nonEmpty) buckets(t.length - 1).add(t))
    buckets
  }

  override def nullSafeEval(v: Any): Any =
    Wordpiece.minTokens(v.asInstanceOf[UTF8String].toString, vocabByLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mtEnc", this, classOf[MinTokensEncode].getName)
    // explicit .longValue(): ev.value is a primitive long slot, and the
    // object-cast-only form would lean on Janino auto-unboxing (ADVICE
    // r11 — a silent interpreted fallback if Janino ever rejects it)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM Viterbi combined score (cost·[[Wordpiece.ViterbiScale]] +
  * ntok, minimized jointly — see [[Wordpiece.viterbiScore]]) under a
  * learned (token → integer cost) table baked into the plan. */
case class ViterbiScoreEncode(child: Expression,
    vocabCosts: Seq[(String, Long)], fallback: Long)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_viterbi_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string word, got ${other.simpleString}")
    }

  @transient private lazy val costByLen: Array[java.util.HashMap[String, java.lang.Long]] = {
    val maxLen = if (vocabCosts.isEmpty) 1 else vocabCosts.map(_._1.length).max
    val buckets = Array.fill(maxLen)(new java.util.HashMap[String, java.lang.Long]())
    vocabCosts.foreach { case (t, c) =>
      if (t.nonEmpty) buckets(t.length - 1).put(t, java.lang.Long.valueOf(c)) }
    buckets
  }

  override def nullSafeEval(v: Any): Any =
    Wordpiece.viterbiScore(v.asInstanceOf[UTF8String].toString, costByLen,
      fallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vitEnc", this, classOf[ViterbiScoreEncode].getName)
    // explicit .longValue(): ev.value is a primitive long slot (the
    // MinTokensEncode convention)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Segmentation under a learned flat vocabulary, baked into the plan as
  * literals. */
case class WordpieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string word, got ${other.simpleString}")
    }

  @transient private lazy val vocabByLen: Array[java.util.HashSet[String]] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val buckets = Array.fill(maxLen)(new java.util.HashSet[String]())
    vocab.foreach(t => if (t.nonEmpty) buckets(t.length - 1).add(t))
    buckets
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Wordpiece.segment(v.asInstanceOf[UTF8String].toString, vocabByLen)
        .map(UTF8String.fromString(_).asInstanceOf[AnyRef]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEnc", this, classOf[WordpieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
