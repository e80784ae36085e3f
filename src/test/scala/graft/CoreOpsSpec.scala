package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoreOps

class CoreOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("q1_agg: counts reconcile with the raw scan") {
    val rows = CoreOps.q1Agg(s, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(s, sf)
      .filter("l_shipdate <= timestamp_ntz'1998-09-02 00:00:00'").count()
    assert(total == expected)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_qty")
      assert(avg > 0 && avg <= 50, s"avg_qty out of domain: $avg")
    }
  }

  test("q3/q5 plans broadcast the dim side") {
    val p3 = CoreOps.q3JoinAgg(s, sf).queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), p3.take(1500))
    val p5 = CoreOps.q5Multijoin(s, sf).queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin"), p5.take(1500))
  }

  test("q17_small_qty: revenue recomputes from the raw correlated predicate") {
    import org.apache.spark.sql.functions._
    val out = CoreOps.q17SmallQty(s, sf).collect()
      .map(r => r.getAs[String]("p_brand") -> r.getAs[Double]("avg_yearly")).toMap
    assert(out.nonEmpty)
    // brute recompute of the CORRELATED formulation: per part avg, then
    // per-lineitem strict 0.2·avg filter, exact cents
    val li = Tables.lineitem(s, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brand = Tables.part(s, sf).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byPart = li.groupBy(_._1)
    val expect = li.filter { case (p, q, _) =>
      val g = byPart(p); 5L * q * g.length < g.map(_._2).sum
    }.groupBy(t => brand(t._1))
      .map { case (b, rows) => b -> rows.map(_._3).sum.toDouble / 100.0 / 7.0 }
    assert(out.keySet == expect.keySet)
    expect.foreach { case (b, v) =>
      assert(math.abs(out(b) - v) < 1e-9, s"brand $b") }
  }

  test("topk plans as TakeOrdered (no global sort materialization)") {
    val p = CoreOps.topK(s, sf).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("approx_distinct tracks exact distinct within HLL tolerance") {
    val exact = CoreOps.distinctAgg(s, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts")).toMap
    CoreOps.approxDistinct(s, sf).collect().foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag")).toDouble
      val a = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(a - e) / e < 0.2, s"approx $a vs exact $e")
    }
  }

  test("approx_quantiles stay within GK error bounds of the exact percentiles") {
    import org.apache.spark.sql.functions._
    // percentile_approx(accuracy=10000) is a Greenwald–Khanna sketch with
    // guaranteed rank error <= n/accuracy. The exact `quantiles` entry is
    // the documented swap-to-approx-at-scale baseline (its per-group
    // buffer is unbounded); this spec makes the swap claim TESTED: every
    // approx value's true rank must sit within eps·n of the target rank.
    val acc = 10000.0
    val byPriority = Tables.orders(s, sf)
      .select(col("o_orderpriority").as("pr"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
      .collect()
      .groupBy(_.getAs[String]("pr"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("c")).sorted }
    val approx = CoreOps.approxQuantiles(s, sf).collect()
    assert(approx.length == byPriority.size)
    approx.foreach { r =>
      val vs = byPriority(r.getAs[String]("o_orderpriority"))
      val n = vs.length.toDouble
      val eps = n / acc + 1 // +1 absorbs the cents round-trip on ties
      for ((p, colName) <- Seq(0.5 -> "p50", 0.99 -> "p99")) {
        val v = math.round(r.getAs[Double](colName) * 100.0)
        val rankLo = vs.count(_ < v) // rank interval of v among the exact
        val rankHi = vs.count(_ <= v) // values (duplicates widen it)
        val target = p * n
        assert(rankLo - eps <= target && target <= rankHi + eps,
          s"$colName=$v true-rank [$rankLo,$rankHi] vs target $target ± $eps (n=$n)")
      }
    }
  }

  test("window_rank: at most 3 per customer, rank starts at 1") {
    val rows = CoreOps.windowRank(s, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rn")).sorted
      assert(ranks.head == 1 && ranks.length <= 3)
    }
  }

  test("window_running: final cumulative equals the customer's exact total") {
    import org.apache.spark.sql.functions._
    val rows = CoreOps.windowRunning(s, sf).collect()
    val expected = Tables.orders(s, sf).groupBy("o_custkey")
      .agg((sum(floor(col("o_totalprice") * 100.0 + 0.5)).cast("double") / 100.0).as("t"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Double]("t")).toMap
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (c, rs) =>
      val finalTotal = rs.map(_.getAs[Double]("run_total")).max
      assert(math.abs(finalTotal - expected(c)) < 1e-6)
    }
  }

  test("semi/anti partition the customer set") {
    val rows = CoreOps.semiAntiJoin(s, sf).collect()
    val total = rows.map(r => r.getAs[Long]("with_big") + r.getAs[Long]("without_big")).sum
    assert(total == Tables.customer(s, sf).count())
  }

  test("rollup: grand-total row present and consistent") {
    val rows = CoreOps.rollupAgg(s, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_cust") == Tables.customer(s, sf).count())
  }

  test("sessionize: session ids start at 1 and only ever step by 1") {
    val rows = CoreOps.sessionize(s, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sess = rs.map(_.getAs[Long]("session_id"))
      assert(sess.head == 1)
      assert(sess.zip(sess.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("pivot covers every event and preserves global count") {
    val rows = CoreOps.pivotEvents(s, sf).collect()
    val n = rows.map { r =>
      Seq("click_n", "error_n", "purchase_n", "signup_n", "view_n")
        .map(c => r.getAs[Long](c)).sum
    }.sum
    assert(n == Tables.events(s, sf).count())
  }

  test("unpivot inverts pivot: users x 5 types, counts preserved incl. zeros") {
    val rows = CoreOps.unpivotEvents(s, sf).collect()
    val users = Tables.events(s, sf).select("user_id").distinct().count()
    assert(rows.length == users * 5)
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(s, sf).count())
  }

  test("corr_agg: coefficients in [-1,1]; histogram partitions all orders; latest_by_key == window formulation") {
    import org.apache.spark.sql.functions._
    CoreOps.corrAgg(s, sf).collect().foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && math.abs(c) <= 1.0 + 1e-12, s"corr out of range: $c")
    }
    val hist = CoreOps.histogram(s, sf).collect()
    assert(hist.map(_.getAs[Long]("n")).sum == Tables.orders(s, sf).count(),
      "histogram buckets must partition the table")
    hist.foreach(r => assert(r.getAs[Double]("lo") < r.getAs[Double]("hi")))
    // one-agg latest == the window-rank formulation
    val viaWindow = Tables.eventsUs(s, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_id").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    val viaAgg = CoreOps.latestByKey(s, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event")).toMap
    assert(viaAgg == viaWindow)
  }

  test("time-range window: counts bounded below by 1, frame respects 30min") {
    val rows = CoreOps.windowTimeRange(s, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("us"))
      sorted.foreach(r => assert(r.getAs[Long]("n_30m") >= 1))
      // recompute one user's frame membership brute-force
      val times = sorted.map(_.getAs[Long]("us"))
      sorted.zip(times).foreach { case (r, t) =>
        val want = times.count(u => u >= t - 1800L * 1000000L && u <= t)
        assert(r.getAs[Long]("n_30m") == want)
      }
    }
  }
}
