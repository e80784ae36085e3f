package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels (SURVEY §2 #34: the brief's "BPE-ish"
  * token counting, upgraded to an actual trained BPE): one merge round
  * ([[BpeMergePair]], applied vocab-wide during training) and the full
  * encode fold ([[BpeEncode]], the learned merge list baked into the
  * plan). Both are native codegen expressions over `array<string>` /
  * `string` — the per-word hot loop never leaves the JVM kernel.
  *
  * Semantics contract shared by train and encode: ONE merge round is a
  * single left-to-right pass replacing non-overlapping (left, right)
  * adjacencies with the concatenation; encoding = folding the merge
  * list in rank order through that same kernel. Training applies round
  * r's winning pair exactly once, so encode-by-fold reproduces the
  * training segmentation by construction.
  */
object Bpe {

  /** One left-to-right merge pass: ["l","o","w"] merge ("l","o") →
    * ["lo","w"]. Non-overlapping: after a merge the cursor jumps past
    * the merged symbol ("aaa" merge (a,a) → ["aa","a"]). */
  def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word under an ordered merge list: split to single chars,
    * fold the merges in rank order through [[mergeOnce]]. */
  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = mergeOnce(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  // ---------- InternalRow-facing kernels ----------

  def mergeOnceData(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def encodeData(word: UTF8String, merges: Array[(String, String)]): ArrayData =
    new GenericArrayData(encodeWord(word.toString, merges)
      .map(UTF8String.fromString(_).asInstanceOf[AnyRef]))

  // ---------- Column entries ----------

  def bpeMergePair(syms: Column, l: String, r: String): Column =
    ColumnBridge.column(BpeMergePair(ColumnBridge.expression(syms), l, r))

  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), merges))
}

/** One training round's merge, applied vocab-wide: (left, right) ride the
  * expression as literals — a new plan per round, exactly like the
  * pagerank loop's per-round join. */
case class BpeMergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)

  override def nullSafeEval(v: Any): Any =
    Bpe.mergeOnceData(v.asInstanceOf[ArrayData], l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMergePair].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full encode under a learned merge list (rank order), baked into the
  * plan as a literal — ≤ a few hundred merges, the broadcast-for-free
  * shape literal LSH planes use. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string word, got ${other.simpleString}")
    }

  @transient private lazy val mergeArr = merges.toArray

  override def nullSafeEval(v: Any): Any =
    Bpe.encodeData(v.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEnc", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
