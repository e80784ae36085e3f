package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("graft functions are SQL-callable via SparkSessionExtensions") {
    // Force a NEW session (sharing the JVM's SparkContext) so the
    // extension registration path actually runs — getOrCreate would
    // silently reuse an existing session and skip extensions.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val fp = s.sql("SELECT graft_rolling_hash64('a b c') AS fp").head().getLong(0)
      val want = "a b c".getBytes("UTF-8")
        .foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xffL)) * 0x100000001b3L)
      assert(fp == want)
      val d = s.sql(
        "SELECT graft_dot_e12(array(cast(0.5 as float)), array(cast(2.0 as float))) AS d")
        .head().getLong(0)
      assert(d == 1000000000000L)
      val mh = s.sql("SELECT graft_minhash32('a b c d') AS sig").head().getSeq[Long](0)
      assert(mh.length == 32)
      assert(s.sql("SELECT graft_minhash32('a b') AS sig").head().isNullAt(0),
        "fewer than 3 tokens must yield null")
      val sh64 = s.sql("SELECT graft_simhash64('a b c') AS sh").head().getLong(0)
      assert(sh64 == graft.functions.SimHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
      val cs = s.sql("SELECT graft_char_stats('abab') AS c").head().getStruct(0)
      assert(cs.getLong(0) == 4L && cs.getLong(1) == 2L && cs.getLong(2) == 8L)
      val ws = s.sql("SELECT graft_word_stats('a b a b a') AS w").head().getStruct(0)
      assert(ws.getLong(0) == 5L && ws.getLong(1) == 2L && ws.getLong(2) == 3L &&
        ws.getLong(3) == 4L && ws.getLong(4) == 2L)

      // ---- RangeJoinRule: key-less interval join loses its nested loop ----
      s.conf.set(graft.plans.RangeJoinRule.BinWidthConf, "100")
      import s.implicits._
      Seq((1L, 50L), (2L, 149L), (3L, 150L), (4L, 1000L))
        .toDF("pid", "t").createOrReplaceTempView("pts")
      Seq((10L, 40L, 150L), (11L, 900L, 950L))
        .toDF("wid", "lo", "hi").createOrReplaceTempView("ivals")
      val q = s.sql("SELECT wid, pid FROM pts JOIN ivals ON t >= lo AND t < hi")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n${plan.take(1500)}")
      assert(plan.contains("Generate"), "expected the bin explode")
      val got = q.as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (10L, 2L)),
        s"hi must stay exclusive and out-of-window points dropped: $got")

      // boundary forms: > and <= also rewrite
      val q2 = s.sql("SELECT wid, pid FROM pts JOIN ivals ON t > lo AND t <= hi")
      assert(!q2.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(q2.as[(Long, Long)].collect().toSet == Set((10L, 1L), (10L, 2L), (10L, 3L)))

      // fallback: a mixed-width interval set where one interval exceeds
      // the bin cap joins via the coarse tier — correct rows, no nested
      // loop, no error (binWidth=100, maxBins=4 → coarse width 400;
      // [0,1500) spans 16 base bins > 4 but only 4 coarse bins)
      s.conf.set(graft.plans.RangeJoinRule.MaxBinsConf, "4")
      try {
        Seq((10L, 40L, 150L), (12L, 0L, 1500L))
          .toDF("wid", "lo", "hi").createOrReplaceTempView("ivals_mixed")
        val qm = s.sql("SELECT wid, pid FROM pts JOIN ivals_mixed ON t >= lo AND t < hi")
        val pm = qm.queryExecution.executedPlan.toString
        assert(!pm.contains("BroadcastNestedLoopJoin") && !pm.contains("CartesianProduct"),
          s"mixed-width set must still equi-join:\n${pm.take(1500)}")
        assert(qm.as[(Long, Long)].collect().toSet ==
          Set((10L, 1L), (10L, 2L), (12L, 1L), (12L, 2L), (12L, 3L), (12L, 4L)),
          "coarse-tier fallback must keep exact semantics")

        // guard: an interval too wide even for the coarse tier fails with
        // an actionable error instead of exploding a huge array
        val wide = s.sql(
          "SELECT wid, pid FROM pts JOIN ivals ON t >= lo - 100000 AND t < hi + 100000")
        val e = intercept[Exception](wide.collect())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("graft range-join rewrite")),
          s"expected the bin-cap error, got: ${msgs(e).mkString(" | ")}")

        // inverted interval (hi < lo): no rows, no error, no runaway
        // descending sequence
        Seq((13L, 500L, 100L), (10L, 40L, 150L))
          .toDF("wid", "lo", "hi").createOrReplaceTempView("ivals_inv")
        val qi = s.sql("SELECT wid, pid FROM pts JOIN ivals_inv ON t >= lo AND t < hi")
        assert(qi.as[(Long, Long)].collect().toSet == Set((10L, 1L), (10L, 2L)),
          "inverted interval must match nothing; healthy sibling unaffected")
      } finally s.conf.unset(graft.plans.RangeJoinRule.MaxBinsConf)

      // a join that already has an equi key must be left alone (no explode)
      Seq((1L, 1L, 50L)).toDF("k", "pid", "t").createOrReplaceTempView("pts_k")
      Seq((1L, 10L, 40L, 150L)).toDF("k", "wid", "lo", "hi").createOrReplaceTempView("ivals_k")
      val q3 = s.sql(
        "SELECT wid, pid FROM pts_k p JOIN ivals_k i ON p.k = i.k AND t >= lo AND t < hi")
      assert(!q3.queryExecution.executedPlan.toString.contains("Generate"),
        "equi-keyed join must not be rewritten")
      assert(q3.as[(Long, Long)].collect().toSet == Set((10L, 1L)))

      // ---- SQL facade: whole engine drivable from spark.sql ----
      val agg = graft.Sql.run(s, TestSpark.sf,
        """SELECT l_returnflag, count(*) AS n FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin)
      assert(agg.collect().map(_.getLong(1)).sum ==
        graft.Tables.lineitem(s, TestSpark.sf).count())
      // events view carries the µs-normalized timestamp
      val ts = s.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
      assert(ts.typeName == "timestamp")
    } finally {
      // restore the shared test session as default; do NOT stop the context
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
