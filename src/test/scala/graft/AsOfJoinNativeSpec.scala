package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalOps

/** The native as-of join physical operator (plans/AsOfJoinExec): semantics
  * vs the window twin, edge cases the merge pass must get right, and the
  * plan shape that justifies its existence (no window, no union, one
  * exchange per side). */
class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf
  import s.implicits._

  private def native(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, tiebreak: Seq[String] = Nil) =
    TemporalOps.asofJoinNative(left, right, "k", "rk", "t", "rt", tiebreak)

  test("basic semantics: latest right at-or-before, inclusive, LEFT") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (1L, 4L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 25L, 200.0), (2L, 9L, 300.0))
      .toDF("rk", "rt", "v")
    val out = native(left, right)
      .select(col("tag"), col("v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") == 100.0)   // t=10 → right t=5
    assert(out("b") == 200.0)   // inclusive: t=25 matches right t=25
    assert(out("c") == null)    // right t=9 is after left t=5
    assert(out("d") == null)    // before any right row
  }

  test("ties on (key, ts) resolve to the tiebreak-largest right row") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 3L, "lo"), (1L, 10L, 7L, "hi"), (1L, 10L, 5L, "mid"))
      .toDF("rk", "rt", "pri", "tag")
    val out = native(left, right, tiebreak = Seq("pri")).collect().head
    assert(out.getAs[String]("tag") == "hi")
  }

  test("null keys and null timestamps never match (either side)") {
    val left = Seq((Some(1L), Some(10L), "ok"), (None, Some(10L), "nullkey"),
      (Some(1L), None, "nullts")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(5L), "m"), (None, Some(1L), "rnullkey"),
      (Some(1L), None, "rnullts")).toDF("rk", "rt", "rtag")
    val out = native(left, right)
      .select(col("tag"), col("rtag")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("ok") == "m")          // matches the real row, skipping null rk/rt rows
    assert(out("nullkey") == null)
    assert(out("nullts") == null)
  }

  test("matches the union+window asofJoin bit-for-bit on sf events") {
    val nat = TemporalOps.asofClickPurchaseNative(s, sf).collect()
    val win = TemporalOps.asofClickPurchase(s, sf).collect()
    assert(nat.length == win.length)
    assert(nat.sameElements(win))
  }

  test("plan: AsOfJoinExec, one exchange per side, no window/union/BNLJ") {
    val df = TemporalOps.asofClickPurchaseNative(s, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec"), s"native exec missing:\n${plan.take(1200)}")
    assert(!plan.contains("Window"), "no window expected anywhere in the native plan")
    assert(!plan.contains("Union"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // exactly two hash exchanges feed the join (plus the final orderBy's range)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n${plan.take(1500)}")
  }

  test("works via a GraftExtensions-built session (strategy injected)") {
    import org.apache.spark.sql.SparkSession
    // force a NEW session sharing the JVM's context (ExtensionsSpec pattern)
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder()
      .master("local[2]")
      .appName("graft-asof-ext")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // the extension injected the strategy — the ensureStrategy fallback
      // inside asofJoinNative must be a no-op here, and the plan native
      val df = TemporalOps.asofClickPurchaseNative(fresh, sf)
      assert(df.queryExecution.executedPlan.toString.contains("AsOfJoinExec"))
      assert(df.count() > 0)
      // pruning interplay: selecting a right column NOT in key/ts/tiebreak
      // must survive ColumnPruning (rightSource keeps it required)
      val l2 = Seq((1L, 10L)).toDF("k", "t")
      val r2 = Seq((1L, 5L, "payload")).toDF("rk", "rt", "extra")
      val only = TemporalOps.asofJoinNative(l2, r2, "k", "rk", "t", "rt")
        .select("extra").collect()
      assert(only.head.getString(0) == "payload")
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
