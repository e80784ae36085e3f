package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution moments (total chars, distinct chars, Σcount²)
  * in ONE O(L) pass over the string — the native engine for
  * `TextOps.charDiversity`.
  *
  * The `functions._` formulation (split("") → array_sort → aggregate
  * fold) is O(L log L) and, worse, runs the fold as an INTERPRETED
  * higher-order lambda allocating a struct per character — measured ~20 s
  * on one 10⁷-char document (LongDocSpec). This expression iterates the
  * UTF8 payload's code points with an ASCII fast-array + spillover map,
  * no array materialization, and stays inside whole-stage codegen via one
  * static call per row.
  *
  * Code-point semantics match `split(text, "")` (Java regex splits
  * between code points, keeping surrogate pairs whole) and DuckDB's
  * `string_split_regex(text, '')` — the oracle twin is unchanged.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharStats.Out
  override def prettyName: String = "graft_char_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    CharStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  val Out: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("distinct", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))

  /** One pass: ASCII counts in a flat array (the hot path for real
    * corpora), anything above U+007F in a small open hash map. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // split("", "") yields [""] in BOTH engines (one empty element), so an
    // empty text counts as one "char" — not zero, which would NaN the
    // simpson/eff divisions and diverge from the oracle
    if (str.isEmpty)
      return new GenericInternalRow(Array[Any](1L, 1L, 1L))
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val cell = other.get(cp)
        if (cell == null) other.put(cp, Array(1L)) else cell(0) += 1
      }
    }
    var distinct = 0L
    var sumsq = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { distinct += 1; sumsq += c * c }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        distinct += 1; sumsq += c * c
      }
    }
    new GenericInternalRow(Array[Any](n, distinct, sumsq))
  }

  /** Column-level entry. */
  def charStats(c: Column): Column =
    ColumnBridge.column(CharStats(ColumnBridge.expression(c)))
}
