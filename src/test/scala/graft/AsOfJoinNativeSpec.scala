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

  private def nativeNearest(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, tiebreak: Seq[String] = Nil) =
    TemporalOps.asofJoinNative(left, right, "k", "rk", "t", "rt", tiebreak,
      nearest = true)

  test("nearest: argmin (|Δ|, ts, tiebreak) — past wins equidistant ties") {
    val left = Seq((1L, 10L, "mid"), (1L, 2L, "early"), (1L, 30L, "late"),
      (2L, 10L, "lonely")).toDF("k", "t", "tag")
    val right = Seq((1L, 6L, "p6"), (1L, 14L, "p14"), (1L, 20L, "p20"))
      .toDF("rk", "rt", "rtag")
    val out = nativeNearest(left, right)
      .select(col("tag"), col("rtag")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("mid") == "p6")     // |10−6| == |10−14| → past (smaller ts) wins
    assert(out("early") == "p6")   // only future candidates: earliest after
    assert(out("late") == "p20")   // only past candidates: latest before
    assert(out("lonely") == null)  // no same-key right row
  }

  test("nearest: same-ts ties resolve to the tiebreak-SMALLEST right row") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    // both a past tie group (rt=8) and a future tie group (rt=11):
    // past Δ=2 < future Δ=1? no — future is closer; among rt=11 rows the
    // smallest pri must win (the argmin's last component)
    val right = Seq((1L, 8L, 9L, "past_hi"), (1L, 8L, 1L, "past_lo"),
      (1L, 11L, 7L, "fut_hi"), (1L, 11L, 2L, "fut_lo"))
      .toDF("rk", "rt", "pri", "tag")
    val out = nativeNearest(left, right, tiebreak = Seq("pri")).collect().head
    assert(out.getAs[String]("tag") == "fut_lo")
    // and when the past group is the closer one, its smallest pri wins
    val left2 = Seq((1L, 9L)).toDF("k", "t") // Δpast=1, Δfut=2
    val out2 = nativeNearest(left2, right, tiebreak = Seq("pri")).collect().head
    assert(out2.getAs[String]("tag") == "past_lo")
  }

  test("nearest: matches the two-window asofNearest bit-for-bit on sf events") {
    val nat = TemporalOps.asofClickPurchaseNearestNative(s, sf).collect()
    val win = TemporalOps.asofNearest(s, sf).collect()
    assert(nat.length == win.length && nat.length > 0)
    assert(nat.sameElements(win))
  }

  test("nearest: property test vs brute-force argmin on adversarial keys") {
    val rnd = new scala.util.Random(1105)
    // small ts domain forces heavy (key, ts) collisions on both sides
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(30).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(30).toLong, i.toLong))
      .toDF("rk", "rt", "rid")
    val got = nativeNearest(left, right, tiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val ls = left.select("k", "t", "lid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.select("rk", "rt", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ls.foreach { case (k, t, lid) =>
      val cands = rs.filter(_._1 == k)
      val want = if (cands.isEmpty) -1L
        else cands.minBy { case (_, rt, rid) => ((rt - t).abs, rt, rid) }._3
      assert(got(lid) == want, s"lid=$lid k=$k t=$t: got ${got(lid)}, want $want")
    }
  }

  test("nearest: plan is the same merge shape (no window, 2 exchanges)") {
    val df = TemporalOps.asofClickPurchaseNearestNative(s, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec"))
    assert(!plan.contains("Window") && !plan.contains("Union"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n${plan.take(1500)}")
  }

  test("nearest: rejects non-long-backed timestamps") {
    val l = Seq((1L, "x")).toDF("k", "t")
    val r = Seq((1L, "y")).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      nativeNearest(l, r).collect()
    }
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
