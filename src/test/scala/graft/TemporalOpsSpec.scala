package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalOps

/** As-of and range join semantics + plan shape (no nested-loop joins). */
class TemporalOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf
  import s.implicits._

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (1L, 4L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 25L, 200.0), (2L, 9L, 300.0))
      .toDF("k", "t", "v")
    val out = TemporalOps.asofJoin(left, right, "k", "t", "m")
      .select(col("tag"), col("m.v").as("v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") == 100.0)   // t=10 → right t=5
    assert(out("b") == 200.0)   // inclusive: t=25 matches right t=25
    assert(out("c") == null)    // right t=9 is after left t=5
    assert(out("d") == null)    // before any right row
  }

  test("asofJoin: null right attribute does not skip a newer match") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some(1.0)), (1L, 10L, None)).toDF("k", "t", "v")
    val out = TemporalOps.asofJoin(left, right, "k", "t", "m")
      .select(col("m.t").as("mt"), col("m.v").as("v")).collect().head
    assert(out.getLong(0) == 10L, "must match the newest row even if its attr is null")
    assert(out.isNullAt(1))
  }

  test("rangeJoinBinned: exact [lo, hi) semantics across bin boundaries") {
    val points = Seq((1L, 0L, "p0"), (1L, 999L, "p1"), (1L, 1000L, "p2"),
      (1L, 1700L, "p3"), (2L, 500L, "p4")).toDF("k", "t", "pid")
    val ivals = Seq((1L, 500L, 1500L, "w1"), (2L, 400L, 500L, "w2"))
      .toDF("k", "lo", "hi", "wid")
    // binWidth much smaller than the interval → multi-bin explode path
    val out = TemporalOps.rangeJoinBinned(points, ivals, "k", "t", "lo", "hi", 300L)
      .select("wid", "pid").as[(String, String)].collect().toSet
    assert(out == Set(("w1", "p1"), ("w1", "p2")),
      s"hi must be exclusive, lo inclusive; got $out")
  }

  test("rangeJoinBinned produces no duplicate pairs") {
    val points = Seq((1L, 100L, "p")).toDF("k", "t", "pid")
    val ivals = Seq((1L, 0L, 10000L, "w")).toDF("k", "lo", "hi", "wid")
    val n = TemporalOps.rangeJoinBinned(points, ivals, "k", "t", "lo", "hi", 50L).count()
    assert(n == 1L)
  }

  test("binned + ladder: inverted interval (hi < lo) matches nothing, no runaway sequence") {
    // without the guard, sequence(lo div w, hi div w) with hi < lo emits a
    // DESCENDING array (default step -1) — here 2M spurious bins per row
    val points = Seq((1L, 100L, "p")).toDF("k", "t", "pid")
    val ivals = Seq((1L, 100000000L, 50L, "inv"), (1L, 50L, 200L, "ok"))
      .toDF("k", "lo", "hi", "wid")
    val binned = TemporalOps.rangeJoinBinned(points, ivals, "k", "t", "lo", "hi", 50L)
      .select("wid", "pid").as[(String, String)].collect().toSet
    assert(binned == Set(("ok", "p")))
    val ladder = TemporalOps.rangeJoinLadder(points, ivals, "k", "t", "lo", "hi", 50L)
      .select("wid", "pid").as[(String, String)].collect().toSet
    assert(ladder == Set(("ok", "p")))
  }

  test("range_join plans as an equi-join, never a nested loop") {
    val plan = TemporalOps.rangeClickInPurchaseWindow(s, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n${plan.take(1500)}")
  }

  test("asof_join plans one exchange on the key and no join operator") {
    val plan = TemporalOps.asofClickPurchase(s, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "asof must be window-based, not a join")
    assert(plan.contains("Window"), "expected a window operator")
  }

  test("asof_join on sf data: every match is the latest at-or-before purchase") {
    val out = TemporalOps.asofClickPurchase(s, sf)
    assert(out.filter(col("p_us") > col("us")).count() == 0, "match after click")
    // cross-check a sample user against a brute-force non-equi join
    val ev = Tables.eventsUs(s, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("us").as("p_us2"))
    val brute = clicks.join(purch, col("user_id") === col("pu") && col("p_us2") <= col("us"), "left")
      .groupBy("event_id").agg(max(col("p_us2")).as("want"))
    val joined = out.join(brute, Seq("event_id"))
    assert(joined.filter(not(col("p_us") <=> col("want"))).count() == 0,
      "asof disagrees with brute-force latest-at-or-before")
  }

  test("range_join on sf data matches the brute-force inequality join") {
    val got = TemporalOps.rangeClickInPurchaseWindow(s, sf).count()
    val ev = Tables.eventsUs(s, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("c_us"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"))
    val brute = purch.join(clicks,
      col("user_id") === col("cu") &&
        col("c_us") >= col("us") && col("c_us") < col("us") + lit(1800L * 1000000L)).count()
    assert(got == brute, s"binned=$got brute=$brute")
  }
}
