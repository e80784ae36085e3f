package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized document as ONE native
  * codegen expression.
  *
  * Signature: per token, xxhash64(token, seed 42) votes ±1 on each of 64
  * bits; bit b of the result is set iff its vote total is positive —
  * identical math to the exploded `split → xxhash64 → 64 conditional
  * sums` DataFrame formulation, minus the explode and the 64-column
  * aggregate. That turns signature computation from a shuffle-bearing
  * groupBy into a pure map-side projection fused into the scan by
  * whole-stage codegen — at 100 TB the signatures cost exactly one pass
  * and zero exchanges.
  *
  * Tokens are maximal non-space byte runs (empty tokens from repeated
  * spaces carry no content and are skipped). Hashing runs directly over
  * the string's unsafe bytes via the same XXH64 kernel Spark's
  * `xxhash64` uses — no per-token string materialization.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String])

  // one shared kernel: generated code calls the same static method the
  // interpreted path uses, so the two can never drift
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Same seed as Spark's `xxhash64(...)` default, so per-token hashes
    * match the DataFrame formulation bit-for-bit. */
  val Seed: Long = 42L

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == ' ') {
        val len = i - start
        if (len > 0) {
          val h = XXH64.hashUnsafeBytes(base, off + start, len, Seed)
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object SimHashFunctions {
  /** 64-bit SimHash of a string column (see [[SimHash64]]). */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
