package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All K=32 MinHash signature slots of a word-3-gram-shingled document,
  * computed in ONE native pass — the same fused-projection treatment
  * [[SimHash64]] gives SimHash.
  *
  * Per shingle (three consecutive whitespace tokens, hashed over the raw
  * byte span from the first token's start to the third's end — identical
  * bytes to the space-joined string whenever the text is single-spaced),
  * slot k tracks `min(xxhash64_fold(slot_seed(k), span_hash))` where
  * `slot_seed(k) = hashInt(k, 42)` — the exact fold Spark's
  * `xxhash64(lit(k), hb)` computes. Shingle multiplicity is irrelevant
  * to a min, so no distinct pass is needed.
  *
  * Documents with fewer than 3 tokens have no shingles and yield NULL
  * (the exploded formulation simply produced no row for them).
  *
  * At 100 TB the signature stage costs one scan with zero exchanges; the
  * banded-LSH candidate join downstream is then the only shuffle in
  * MinHash dedup.
  */
case class MinHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash32"
  override def nullable: Boolean = true // < 3 tokens → no shingles → null

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHash32.compute(v.asInstanceOf[UTF8String])

  // one shared kernel for interpreted + generated paths (cannot drift)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHash32.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash32 {
  val K = 32
  val ShingleWords = 3
  val Seed = 42L

  /** slot_seed(k) = xxhash64's fold state after hashing the int literal k
    * with seed 42 — matches `xxhash64(lit(k), hb)` exactly. */
  private val SlotSeeds: Array[Long] =
    Array.tabulate(K)(k => XXH64.hashInt(k, Seed))

  def compute(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    // token boundaries (byte offsets); tokens are maximal non-space runs
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    var start = -1
    while (i <= n) {
      val isSpace = i == n || Platform.getByte(base, off + i) == ' '
      if (!isSpace && start < 0) start = i
      if (isSpace && start >= 0) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = start
        ends(nTok) = i
        nTok += 1
        start = -1
      }
      i += 1
    }
    if (nTok < ShingleWords) return null
    val mins = Array.fill(K)(Long.MaxValue)
    var t = 0
    while (t <= nTok - ShingleWords) {
      val from = starts(t)
      val len = ends(t + ShingleWords - 1) - from
      val hb = XXH64.hashUnsafeBytes(base, off + from, len, Seed)
      var k = 0
      while (k < K) {
        val slot = XXH64.hashLong(hb, SlotSeeds(k))
        if (slot < mins(k)) mins(k) = slot
        k += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashFunctions {
  /** K=32 MinHash signature array of a string column (see [[MinHash32]]). */
  def minhash32(c: Column): Column =
    ColumnBridge.column(MinHash32(ColumnBridge.expression(c)))
}
