package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling-hash document fingerprint (FNV-1a over UTF-8
  * bytes), as a native codegen expression.
  *
  * `h = 0xcbf29ce484222325; for each byte b: h = (h ^ b) * 0x100000001b3`
  * with Java wrap-around multiplication. This deliberately lives as a custom
  * Catalyst `Expression` rather than a `functions._` composition: Spark's
  * ANSI mode (default in 4.x) makes long-multiplication overflow throw, while
  * a fingerprint *wants* modular wrap-around — and a per-character
  * higher-order fold would be interpreted, not codegen'd. The tight byte
  * loop here stays inside whole-stage codegen, so fingerprinting 100 TB of
  * documents is one scan with no UDF/serialization overhead.
  *
  * Reference capability: document identity/fingerprint keys for the price
  * fact rows the reference pipeline builds per (app, country) — re-expressed
  * for the documents table per SURVEY.md §2 #34.
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash64"

  // SQL-facing via GraftExtensions: reject non-string inputs at analysis
  // time (a numeric arg would ClassCastException on executors otherwise).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = RollingHash64.Seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * RollingHash64.Prime
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, not fixed names: two instances of this expression can
      // land in ONE codegen function (non-nullable input skips the
      // enclosing if-scope), where duplicate locals fail Janino compile
      // and silently fall back to interpreted execution
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${RollingHash64.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * ${RollingHash64.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {
  val Seed: Long = 0xcbf29ce484222325L
  val Prime: Long = 0x100000001b3L
}

object TextHashFunctions {
  /** FNV-1a 64-bit rolling fingerprint of a string column (see [[RollingHash64]]). */
  def rollingHash64(c: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(c)))
}
