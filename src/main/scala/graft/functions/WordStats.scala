package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word/bigram repetition moments (total words, distinct words, top word
  * count, bigram count, distinct bigrams) in ONE O(L) hashed pass — the
  * native engine for `TextOps.repetitionStats` (the Gopher-style gate
  * the round-4 verdict flagged: its job is screening pathological
  * long documents, so IT cannot be the slow path on them).
  *
  * Tokenization contract (must mirror the `functions._` twin and the
  * DuckDB oracle exactly): words are `split(text, " ")` — single-space
  * separators with ALL empty segments kept (regex-split, limit −1);
  * bigrams are the n−1 adjacent pairs joined by one space, none when
  * words_n < 2. The fold twin sorts the 10⁷-entry word array and folds
  * an interpreted lambda over it (O(L log L), measured seconds); this
  * pass hashes each token once.
  */
case class WordStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WordStats.Out
  override def prettyName: String = "graft_word_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    WordStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordStats {
  val Out: StructType = StructType(Seq(
    StructField("words_n", LongType, nullable = false),
    StructField("uniq_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("bigrams_n", LongType, nullable = false),
    StructField("uniq_bigrams", LongType, nullable = false)))

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val words = new java.util.HashMap[String, Array[Long]]()
    // bigram keys are "prev cur" — identical to the materialized gram
    // string, so distinctness matches the array formulation exactly
    val bigrams = new java.util.HashSet[String]()
    var wordsN = 0L
    var bigramsN = 0L
    var top = 0L
    var prev: String = null
    var start = 0
    val len = str.length
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        wordsN += 1
        val cell = words.get(tok)
        val c = if (cell == null) { words.put(tok, Array(1L)); 1L }
        else { cell(0) += 1; cell(0) }
        if (c > top) top = c
        if (prev != null) {
          bigramsN += 1
          bigrams.add(prev + " " + tok)
        }
        prev = tok
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](wordsN, words.size.toLong, top,
      bigramsN, bigrams.size.toLong))
  }

  /** Column-level entry. */
  def wordStats(c: Column): Column =
    ColumnBridge.column(WordStats(ColumnBridge.expression(c)))
}
