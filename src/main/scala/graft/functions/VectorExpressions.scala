package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, FloatType, LongType}

/** Scaled-integer dot product over two `array<float>` embedding columns.
  *
  * Returns `sum_i floor(a(i)*b(i)*1e12 + 0.5)` as a 64-bit integer. Two
  * reasons this is an integer, not a double:
  *
  *  1. Cross-engine determinism: the driver's correctness gate hash-compares
  *     Spark results against a DuckDB oracle. Floating-point dot products
  *     depend on accumulation order; per-term `floor(x*y*1e12+0.5)` followed
  *     by an integer sum is order-independent and bit-exact in both engines.
  *  2. Performance: this is a native codegen expression (tight primitive
  *     loop inside whole-stage codegen), not an interpreted higher-order
  *     `aggregate(zip_with(...))` chain — the hot path of every cosine /
  *     ANN operator at 100 TB scale.
  *
  * Cosine similarity = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), all
  * built from these exact integers, so the final doubles are deterministic.
  */
case class DotE12(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_e12"
  override def nullable: Boolean = true // also null on length mismatch

  // SQL-facing via GraftExtensions: reject non-float-array inputs at
  // analysis time instead of crashing (or misreading) on executors.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) {
      null // dimension drift: surface as null, never a partial dot product
    } else {
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(
          x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1.0e12 + 0.5).toLong
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed names: lshBucket/annIvf put 6–16 DotE12 calls
      // in one projection — fixed locals would collide in a single codegen
      // function and silently disable whole-stage codegen (Janino error)
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1.0E12d + 0.5d);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Exact scaled-int dot product of two float-array columns (see [[DotE12]]). */
  def dotE12(a: Column, b: Column): Column =
    ColumnBridge.column(DotE12(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact scaled-int squared-norm of a float-array column. */
  def normE12(a: Column): Column = dotE12(a, a)
}
