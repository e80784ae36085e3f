package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** General analytics core, SURVEY.md §2 #13–23.
  *
  * Scale design: fact-side aggregations are partial-agg groupBys on natural
  * keys; every dim side is broadcast; windows partition on bounded keys
  * (custkey/userkey) — the only global sorts are final small top-k edges.
  * All money sums go through [[Det]] (exact integer cents) so results are
  * bit-identical to the DuckDB oracle regardless of accumulation order.
  */
object CoreOps {

  private val cutoff = lit("1998-09-02 00:00:00").cast("timestamp_ntz")

  /** #13 q1_agg — scan → filter → groupBy → multi-agg (TPC-H Q1 shape). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= cutoff)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.sumE2(col("l_quantity")).as("sum_qty"),
        Det.sumE2(col("l_extendedprice")).as("sum_base_price"),
        Det.sumE2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.avgE2(col("l_quantity")).as("avg_qty"),
        Det.avgE2(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #14 q3_join_agg — fact⋈dim⋈dim + agg + top-k (TPC-H Q3 shape).
    * customer is the small side → broadcast; the orders⋈lineitem join
    * shuffles once on orderkey. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        to_date(col("o_orderdate")).cast("timestamp_ntz").as("orderdate"))
      .agg(Det.sumE2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** #15 q5_multijoin — 6-table join chain with region filter (TPC-H Q5
    * shape). region/nation/supplier dims broadcast; the big
    * orders⋈lineitem join shuffles on orderkey. */
  def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    val cust = Tables.customer(s, dir)
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(Det.sumE2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** #15b q17_small_qty — the CORRELATED SCALAR SUBQUERY pattern (TPC-H
    * Q17: lineitems below 20% of their own part's average quantity),
    * DECORRELATED into a pre-aggregated self-join — the rewrite every
    * engine must do because per-row subquery execution is O(fact²).
    * The per-part (Σqty, n) aggregate joins back on l_partkey (both
    * sides key-partitioned on the same column — one exchange each, AQE
    * picks broadcast when the part dimension allows), and the
    * `qty < 0.2·avg` predicate becomes the EXACT integer cross-multiply
    * `5·qty·n < Σqty` — no division, no doubles, so the filtered set is
    * bit-identical in both engines (quantities are integral; the
    * oracle mirrors the same cast). Per-brand avg-yearly revenue from
    * exact cents, two mirrored divisions at the edge. */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey"),
      col("l_quantity").cast("long").as("qty"),
      Det.e2(col("l_extendedprice")).cast("long").as("price_c"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum(col("qty")).as("sum_q"), count(lit(1)).as("n_q"))
    val parts = Tables.part(s, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    li.join(perPart, "l_partkey")
      .filter(col("qty") * col("n_q") * lit(5L) < col("sum_q"))
      .join(broadcast(parts), "l_partkey")
      .groupBy("p_brand")
      .agg((sum(col("price_c")).cast("double") / lit(100.0) / lit(7.0))
        .as("avg_yearly"))
      .orderBy("p_brand")
  }

  /** #16 window_rank — top-3 orders per customer by price; row_number over
    * a bounded partition key with a unique tiebreak. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** #17 window_running — running order total per customer over exact
    * integer cents (unbounded-preceding frame). */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("run_total",
        sum(Det.e2(col("o_totalprice"))).over(w).cast("double") / lit(100.0))
      .select("o_custkey", "o_orderkey", "run_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** #18 topk — global order-by-limit; Spark plans TakeOrderedAndProject
    * (per-partition heap + small merge), never a full global sort. */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** #19 distinct_agg — exact distinct counts per group. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** #19b approx_distinct (rows-only twin) — approx_count_distinct (HLL++)
    * is the 100 TB path: one pass, no per-key shuffle of distinct values. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"))
      .orderBy("l_returnflag")

  /** #20b set_ops — INTERSECT / EXCEPT over the customer sets of two
    * order periods, tagged and unioned into one frame. Expressed as ONE
    * conditional aggregation: a single scan of orders, a single shuffle on
    * o_custkey with map-side partial agg, then a CASE over the two period
    * flags — semantically identical to the three intersect/except legs
    * (which cost 6 scans + 4 shuffles; round-2 verdict) at 1/6 the I/O. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    Tables.orders(s, dir)
      // null order dates belong to NEITHER period (the intersect/except
      // formulation and the oracle's filtered CTEs both drop them; an
      // unfiltered max(bool) would mis-tag an all-null customer)
      .filter(col("o_orderdate").isNotNull)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate") < cut).as("has_early"),
        max(col("o_orderdate") >= cut).as("has_late"))
      .select(col("o_custkey"),
        when(col("has_early") && col("has_late"), "both")
          .when(col("has_early"), "early_only")
          .otherwise("late_only").as("tag"))
      .orderBy("tag", "o_custkey")
  }

  /** #20 semi_anti_join — EXISTS / NOT EXISTS as left-semi / left-anti
    * joins (no row duplication, no distinct needed). */
  def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 150000.0).select("o_custkey")
    val cust = Tables.customer(s, dir)
    val withBig = cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("with_big"))
    val withoutBig = cust.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("without_big"))
    withBig.join(withoutBig, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_big"), lit(0L)).as("with_big"),
        coalesce(col("without_big"), lit(0L)).as("without_big"))
      .orderBy("c_mktsegment")
  }

  /** #21 rollup_agg — hierarchical region→nation rollup. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    // The Dataset rollup API trips Spark 4's ambiguous-self-join detection
    // on the Expand's duplicated grouping attributes; the SQL surface of
    // the very same plan does not — so this operator goes through
    // spark.sql over a temp view of the (broadcast-joined) input.
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region_name"), col("n_name").as("nation_name"),
        col("c_acctbal"))
      .createOrReplaceTempView("graft_rollup_src")
    s.sql(
      """SELECT region_name, nation_name, COUNT(*) AS n_cust,
        |  CAST(SUM(FLOOR(c_acctbal*100.0+0.5)) AS DOUBLE)/100.0 AS total_bal
        |FROM graft_rollup_src
        |GROUP BY ROLLUP(region_name, nation_name)
        |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin)
  }

  /** #21b cube_agg — full cross-dimensional aggregation (every grouping
    * set of (returnflag, linestatus)); like rollup, goes through the SQL
    * surface to sidestep the Dataset-API Expand ambiguity check. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .createOrReplaceTempView("graft_cube_src")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(FLOOR(l_quantity*100.0+0.5)) AS DOUBLE)/100.0 AS sum_qty
        |FROM graft_cube_src
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** #19c quantiles — exact interpolated p50/p90/p99 of order totals per
    * priority, over exact integer cents (both engines use the standard
    * (n-1)p linear interpolation, so the doubles are deterministic).
    *
    * SCALE NOTE: Spark's exact `percentile` buffers every value of a
    * group in the aggregation buffer — memory is O(group size), which
    * OOMs an executor at warehouse scale (5 priorities × ~10¹¹ values).
    * This entry is the correctness baseline at test SFs; the production
    * path is [[approxQuantiles]] (GK sketch: single-pass, mergeable,
    * bounded memory), and CoreOpsSpec's bound-transfer test proves the
    * approx twin stays within the sketch's rank-error guarantee of these
    * exact results, so the swap-at-scale is tested, not asserted. */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        (percentile(Det.e2(col("o_totalprice")), lit(0.5)) / lit(100.0)).as("p50"),
        (percentile(Det.e2(col("o_totalprice")), lit(0.9)) / lit(100.0)).as("p90"),
        (percentile(Det.e2(col("o_totalprice")), lit(0.99)) / lit(100.0)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** #19d approx_quantiles (rows-only twin) — percentile_approx
    * (Greenwald-Khanna sketch): single-pass, mergeable, bounded memory —
    * the 100 TB path for quantiles. */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        (percentile_approx(Det.e2(col("o_totalprice")), lit(0.5), lit(10000)) / lit(100.0)).as("p50"),
        (percentile_approx(Det.e2(col("o_totalprice")), lit(0.99), lit(10000)) / lit(100.0)).as("p99"))
      .orderBy("o_orderpriority")

  /** #19e corr_agg — Pearson correlation of quantity vs price per return
    * flag from EXACT integer moments: cents-scaled values, DECIMAL(38)
    * sums (no float accumulation anywhere), the closed form evaluated
    * once on the exact moments at the result edge — so the output double
    * is deterministic and hash-matches the oracle's HUGEINT moments.
    * One scan, one partial-agg shuffle; moment sums fit DECIMAL(38) to
    * ~10^12 rows at these magnitudes. */
  def corrAgg(s: SparkSession, dir: String): DataFrame = {
    val xc = Det.e2(col("l_quantity")).cast("decimal(38,0)")
    val yc = Det.e2(col("l_extendedprice")).cast("decimal(38,0)")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(xc).as("sx"), sum(yc).as("sy"),
        sum(xc * xc).as("sxx"), sum(yc * yc).as("syy"), sum(xc * yc).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr"))
      .orderBy("l_returnflag")
  }

  /** #19d2 corr_matrix — the FULL pairwise Pearson matrix over the
    * lineitem measures in ONE scan: every per-column sum, square-sum,
    * and cross-sum rides a single partial aggregate (map-side combine →
    * one 1-row reduce), so profiling C columns costs one pass regardless
    * of C(C,2) pairs — the feature-correlation panel a 100 TB training
    * pipeline runs before feature selection, where "one pass" vs "one
    * pass per pair" is the whole game. Moments are exact integers on
    * cents ([[corrAgg]]'s determinism recipe, decimal(38,0) against the
    * oracle's HUGEINT); the pair explosion afterwards is a union of
    * selects over the single aggregate row — free. */
  /** The profiled measure columns (name → lineitem column) — OracleSql
    * interpolates this list so the twin can't drift from the operator. */
  val CorrMeasures: Seq[(String, String)] = Seq(
    "quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
    "discount" -> "l_discount", "tax" -> "l_tax")

  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cents = CorrMeasures.map { case (n, c) =>
      n -> Det.e2(col(c)).cast("decimal(38,0)") }
    val pairCols = for {
      (i, (nx, cx)) <- cents.zipWithIndex.map(_.swap)
      (ny, cy) <- cents.drop(i + 1)
    } yield (nx, ny)
    val aggs =
      cents.map { case (n, c) => sum(c).as(s"s_$n") } ++
      cents.map { case (n, c) => sum(c * c).as(s"ss_$n") } ++
      (for {
        (i, (nx, cx)) <- cents.zipWithIndex.map(_.swap)
        (ny, cy) <- cents.drop(i + 1)
      } yield sum(cx * cy).as(s"sp_${nx}_$ny"))
    // materialize the 1-row moment frame ONCE — the pair branches below
    // each select from it, and without this the union would re-run the
    // full scan per branch
    val m = Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("n"), aggs: _*)
      .localCheckpoint()
    pairCols.map { case (nx, ny) =>
      m.select(lit(nx).as("x"), lit(ny).as("y"), col("n"),
        ((col("n") * col(s"sp_${nx}_$ny") - col(s"s_$nx") * col(s"s_$ny"))
          .cast("double") /
          (sqrt((col("n") * col(s"ss_$nx") - col(s"s_$nx") * col(s"s_$nx"))
            .cast("double")) *
            sqrt((col("n") * col(s"ss_$ny") - col(s"s_$ny") * col(s"s_$ny"))
              .cast("double")))).as("corr"))
    }.reduce(_ unionByName _)
      .orderBy("x", "y")
  }

  /** #19e2 outliers — per-group z-score outlier detection (|z| > 3 order
    * totals within their priority class): group moments come from exact
    * integer sums (as in [[corrAgg]]) broadcast back onto the fact rows,
    * and the z-score is computed with one fixed chain of correctly-
    * rounded double ops — deterministic across engines. Two passes over
    * the fact (moments, then scoring), both pushed-down scans; the
    * moments frame is group-count-sized, always a broadcast. */
  def outliers(s: SparkSession, dir: String, zThreshold: Double = 3.0): DataFrame = {
    val xc = Det.e2(col("o_totalprice")).cast("decimal(38,0)")
    val moments = Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(xc).as("sx"), sum(xc * xc).as("sxx"))
    // z = (n·x − sx) / sqrt(n · (n·sxx − sx²) / (n−1)) — the (x−μ)/s form
    // cleared of per-row divisions so every operand is an exact integer
    val z = (col("n") * xc - col("sx")).cast("double") /
      sqrt(col("n").cast("double") *
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") / (col("n") - 1))
    Tables.orders(s, dir)
      .join(broadcast(moments), Seq("o_orderpriority"))
      .withColumn("z", z)
      .filter(abs(col("z")) > zThreshold)
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "z")
      .orderBy("o_orderkey")
  }

  /** #19f histogram — fixed-width histogram of order totals: the bucket
    * index is EXACT integer arithmetic on cents (no float binning drift
    * at bucket edges), out-of-range rows clamp to the edge buckets.
    * One scan + one tiny groupBy — the profile pass a 100 TB ingest runs
    * per column. */
  def histogram(s: SparkSession, dir: String, buckets: Int = 20,
      loCents: Long = 0L, hiCents: Long = 60000000L): DataFrame = {
    require(buckets > 0 && hiCents > loCents &&
      (hiCents - loCents) % buckets == 0,
      "bucket width must divide the range evenly or the emitted bucket " +
        "boundaries would drift from the binning formula")
    val xc = Det.e2(col("o_totalprice"))
    val idx = least(lit(buckets - 1L), greatest(lit(0L),
      floor((xc - lit(loCents)) * lit(buckets.toLong) / lit(hiCents - loCents))))
    Tables.orders(s, dir)
      .groupBy(idx.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(loCents) + col("bucket") * lit((hiCents - loCents) / buckets))
          .cast("double").divide(lit(100.0)).as("lo"),
        (lit(loCents) + (col("bucket") + 1) * lit((hiCents - loCents) / buckets))
          .cast("double").divide(lit(100.0)).as("hi"),
        col("n"))
      .orderBy("bucket")
  }

  /** #19g latest_by_key — latest event per user as ONE aggregation
    * (max_by over a (time, id) tiebreak struct): the SCD-style "current
    * row per key" primitive. At scale this beats the window-rank
    * formulation — one partial-agg shuffle carrying a single struct per
    * key, no per-partition sort of the whole fact table. */
  def latestByKey(s: SparkSession, dir: String): DataFrame = {
    val ord = struct(col("us"), col("event_id"))
    Tables.eventsUs(s, dir)
      .groupBy("user_id")
      .agg(max_by(col("event_id"), ord).as("last_event"),
        max_by(col("event_type"), ord).as("last_type"),
        max_by(col("us"), ord).as("last_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** #19h profile_table — per-column data-quality profile (row count,
    * non-null count, exact distinct count, min/max) in ONE scan: all
    * metrics for all profiled columns come out of a single aggregate and
    * unpivot to long form with `stack` — the ingest-QA pass that must
    * never cost one scan per column at 100 TB. Min/max go through exact
    * cents so the doubles are deterministic. */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        (min(Det.e2(col(c))).cast("double") / 100.0).as(s"${c}_min"),
        (max(Det.e2(col(c))).cast("double") / 100.0).as(s"${c}_max"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}_nn`, `${c}_nd`, `${c}_min`, `${c}_max`").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stacked) AS (col_name, n_nonnull, n_distinct, min, max)"))
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min", "max")
      .orderBy("col_name")
  }

  /** #19n incremental_stats — incremental maintenance of per-type value
    * statistics: exact algebraic moments (n, Σcents, Σcents² in
    * decimal(38,0), min, max) are built per (event_type, day) partition —
    * the landed-partial shape a 100 TB history maintains — and MERGED to
    * global per-type stats by summing the moments. The oracle computes
    * the same stats in ONE direct pass, so cross-engine hash equality IS
    * the proof that merge-of-partials == direct (the moments are
    * associative and exact). Two bounded keyed shuffles (types×days,
    * then types); a new day's partial folds in without touching history
    * (Round6OpsSpec lands the partials to parquet and re-merges). */
  def incrementalStats(s: SparkSession, dir: String): DataFrame =
    mergeStatsPartials(statsPartials(Tables.eventsUs(s, dir)))

  /** The per-(type, day) mergeable moment partials. */
  def statsPartials(events: DataFrame): DataFrame = {
    val cents = Det.e2(col("value")).cast("decimal(38,0)")
    events
      .withColumn("day", expr("us div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
        sum(cents * cents).as("s2"),
        min(Det.e2(col("value")).cast("long")).as("mn"),
        max(Det.e2(col("value")).cast("long")).as("mx"))
  }

  /** Merge moment partials → per-type stats (sum/min/max of moments). */
  def mergeStatsPartials(partials: DataFrame): DataFrame =
    partials.groupBy("event_type")
      .agg(count(lit(1)).as("n_partials"), sum("n").as("n"),
        sum("s1").as("s1"), sum("s2").as("s2"),
        min("mn").as("mn"), max("mx").as("mx"))
      .select(col("event_type"), col("n_partials"), col("n"),
        (col("s1").cast("double") / 100.0).as("sum_v"),
        (col("mn").cast("double") / 100.0).as("min_v"),
        (col("mx").cast("double") / 100.0).as("max_v"),
        when(col("n") > 1,
          (col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n").cast("double") * (col("n") - 1)) / 10000.0)
          .as("var_v"))
      .orderBy("event_type")

  /** #19i funnel_steps — ordered-event funnel (view → click → purchase):
    * a user counts toward step k only if step k's event happens AT OR
    * AFTER their first step k-1 event.
    *
    * ONE scan + ONE shuffle: each user's events group into a struct
    * array, and the stage times resolve in-group with codegen'd
    * higher-order functions (filter → transform → array_min), each stage
    * gated on the previous — no per-stage rescan of the fact table (the
    * first formulation cost 6 filtered scans) and no join at all. No
    * in-group sort either: every consumer is an array_min over a
    * filtered array, which is order-independent. The per-user array is
    * bounded by that user's event count, the same bound sessionization
    * already carries. */
  def funnelSteps(s: SparkSession, dir: String): DataFrame =
    funnelStepsFrom(Tables.eventsUs(s, dir))

  /** Funnel core on any (user_id, us, event_type) frame (testable). */
  def funnelStepsFrom(ev: DataFrame): DataFrame = {
    val perUser = ev
      .groupBy("user_id")
      .agg(collect_list(struct(col("us"), col("event_type"))).as("evs"))
    def minAtOrAfter(t: Column, typ: String): Column =
      array_min(transform(
        filter(col("evs"), e =>
          e.getField("event_type") === typ && e.getField("us") >= t),
        e => e.getField("us")))
    val staged = perUser
      .withColumn("t1", minAtOrAfter(lit(Long.MinValue), "view"))
      .withColumn("t2", when(col("t1").isNotNull, minAtOrAfter(col("t1"), "click")))
      .withColumn("t3", when(col("t2").isNotNull, minAtOrAfter(col("t2"), "purchase")))
    staged
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"), count(col("t3")).as("n3"))
      .select(expr(
        "stack(3, CAST(1 AS BIGINT), 'view', n1, CAST(2 AS BIGINT), 'click', n2, " +
          "CAST(3 AS BIGINT), 'purchase', n3) AS (step, event_type, n_users)"))
      .orderBy("step")
  }

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** #21c grouping_sets — arbitrary grouping-set aggregation (neither a
    * rollup prefix chain nor a full cube): per-returnflag totals,
    * per-linestatus totals, and the grand total in ONE pass (Expand, no
    * re-scan per set). Goes through the SQL surface like rollup/cube. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .createOrReplaceTempView("graft_gsets_src")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(FLOOR(l_quantity*100.0+0.5)) AS DOUBLE)/100.0 AS sum_qty
        |FROM graft_gsets_src
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** #13b monthly_revenue — calendar rollup: exact-cents revenue and
    * order counts per month (date_trunc on the NTZ order date; output
    * stays a naive timestamp for cross-engine parity). */
  def monthlyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        Det.sumE2(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  /** #23e event_path — each user's full ordered event-type path as one
    * string (the path-analysis primitive behind funnel mining). One
    * groupBy carrying (time, id, type) structs; the in-group array_sort
    * makes the order deterministic without a fact-wide sort, and the
    * output is a scalar string — harness-sortable, no array column. */
  def eventPath(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)
      .groupBy("user_id")
      .agg(concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("path"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** hourly_profile — hour-of-day seasonality panel: event count,
    * distinct users, exact-cents totals per hour 0–23. Output bounded at
    * 24 rows whatever the fact size; one partial-agg shuffle. The
    * load-shaping / anomaly-baseline companion to daily_active. */
  def hourlyProfile(s: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(s, dir)
      .groupBy(hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("users"),
        (sum(graft.functions.Det.e2(col("value"))).cast("double") / lit(100.0))
          .as("total_value"))
      .orderBy("hr")

  /** daily_active — the DAU panel: per-day distinct users, event count,
    * exact-cents value total. One partial-agg shuffle on the day key;
    * the distinct count is exact (per-day cardinalities are the one
    * place exact distinct is cheap — the day partitions the fact). The
    * approx twins for cross-day unions are hll_distinct's landed
    * sketches. */
  def dailyActive(s: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("dau"),
        count(lit(1)).as("n_events"),
        (sum(graft.functions.Det.e2(col("value"))).cast("double") / lit(100.0))
          .as("total_value"))
      .select(col("d").cast("timestamp_ntz").as("day"),
        col("dau"), col("n_events"), col("total_value"))
      .orderBy("day")

  /** cumulative_reach — running DISTINCT user count by day (audience
    * reach). The classic trap is count(distinct) over an expanding
    * window — quadratic state. Instead each user collapses to their
    * FIRST active day (one partial-agg shuffle on user_id), days count
    * their new users, and the running sum rides a window over the
    * COLLAPSED days frame (bounded by the calendar, like the per-country
    * aggregate) — cumulative distinct at linear cost, any scale. */
  def cumulativeReach(s: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.eventsMicros(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id").agg(min(col("d")).as("first_d"))
    val perDay = firstDay.groupBy("first_d")
      .agg(count(lit(1)).as("new_users"))
    val wRun = Window.orderBy("first_d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("cum_users", sum(col("new_users")).over(wRun))
      .select(col("first_d").cast("timestamp_ntz").as("day"),
        col("new_users"), col("cum_users"))
      .orderBy("day")
  }

  /** rolling_median — exact median of the trailing 10 events per user
    * (the robust-baseline pass of monitoring/anomaly pipelines; rolling
    * MEAN is one codegen'd window sum, but an exact rolling median needs
    * the frame values). collect_list over the ROWS frame keeps ≤10
    * integer cents per row — bounded state, one keyed exchange — and the
    * median interpolates two exact ints, so (lo+hi)/2 is an EXACT double
    * (half-integers are representable) and hash-matches DuckDB's
    * quantile_cont regardless of its interpolation formula. */
  def rollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(-9, Window.currentRow)
    val med = medOfSorted(array_sort(col("arr")), size(col("arr")))
    val n = size(col("arr"))
    Tables.eventsUs(s, dir)
      .withColumn("cents", graft.functions.Det.e2(col("value")).cast("long"))
      .withColumn("arr", collect_list(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), n.cast("long").as("n_window"),
        (med / lit(100.0)).as("rolling_median"))
      .orderBy("user_id", "us", "event_id")
  }

  /** Interpolated median of a SORTED numeric array column — one formula
    * for both parities ((x+x)/2 == x exactly). Shared by rolling_median
    * and rolling_mad_outliers. */
  private def medOfSorted(sorted: Column, n: Column): Column =
    (element_at(sorted, ((n + 1) / 2).cast("int")) +
      element_at(sorted, ((n + 2) / 2).cast("int")))
      .cast("double") / lit(2.0)

  /** rolling_mad_outliers — robust anomaly flags: a value is anomalous
    * when it sits more than k median-absolute-deviations from the
    * trailing-10 median (the MAD rule — unlike z-scores, one spike
    * cannot inflate its own baseline). Exactness chain: integer cents →
    * half-integer median → half-integer deviations → quarter-exact MAD;
    * every double along the way is exactly representable, so the flags
    * hash-match the oracle's list_aggregate medians bit-for-bit. The
    * med column is materialized BEFORE the deviation lambda references
    * it (the winnowing lesson). */
  def rollingMadOutliers(s: SparkSession, dir: String, k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(-9, Window.currentRow)
    val base = Tables.eventsUs(s, dir)
      .withColumn("cents", graft.functions.Det.e2(col("value")).cast("long"))
      .withColumn("arr", collect_list(col("cents")).over(w))
      .withColumn("med", medOfSorted(array_sort(col("arr")), size(col("arr"))))
      .withColumn("mad", medOfSorted(
        array_sort(transform(col("arr"), x => abs(x.cast("double") - col("med")))),
        size(col("arr"))))
    base.select(col("event_id"), col("user_id"),
        size(col("arr")).cast("long").as("n_window"),
        (col("med") / lit(100.0)).as("med_price"),
        (col("mad") / lit(100.0)).as("mad_price"),
        when(col("mad") > 0,
          abs(col("cents") - col("med")) > lit(k) * col("mad"))
          .otherwise(abs(col("cents") - col("med")) > lit(0.0)).as("is_outlier"))
      .orderBy("user_id", "us", "event_id")
  }

  /** session_window_agg — sessionization via Spark's NATIVE session_window
    * operator in BATCH (the same operator the streaming path uses, so the
    * two paths share semantics by construction): gap-merged [start,
    * last+gap) windows per user with count + exact-cents totals. The
    * oracle derives identical sessions from the lag-gap formulation —
    * note session_window opens a NEW session at exactly gap distance
    * (event at prev_end is outside the half-open window), so the twin
    * uses `>= gap`, unlike `sessionize`'s `> gap` convention. One keyed
    * exchange; the session merge is in-partition sort + scan. */
  def sessionWindowAgg(s: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.functions.Det.e2(col("value"))).cast("double") / lit(100.0))
          .as("total_value"))
      .select(col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** event_transitions — first-order Markov transition matrix over each
    * user's event sequence: lead(event_type) within the user's (time,
    * event_id) order pairs every event with its successor, then ONE
    * partial-agg shuffle counts (from_type → to_type) cells; the row
    * probability divides by a window total over the COLLAPSED matrix
    * (bounded by |event types|², never the fact). The sequence-mining /
    * next-action-model primitive. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = Tables.eventsUs(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(wOrd))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = sum(col("n")).over(Window.partitionBy("from_type"))
    pairs.select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / rowTotal).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** #23f retention — cohort retention: each user joins the cohort of
    * their FIRST active day; every (cohort, day-offset) cell counts the
    * distinct users still active that day. The cohort attaches via a
    * user_id-partitioned window min over the per-(user, day) DISTINCT
    * frame — no cohort self-join; the plan is the distinct's shuffle,
    * one window exchange on user_id, and the final cell aggregation.
    * Output is bounded by days², never by the fact. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.eventsMicros(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    active
      .withColumn("cohort", min(col("d")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cohort").cast("timestamp_ntz").as("cohort"),
        col("day_offset"), col("n_active"))
      .orderBy("cohort", "day_offset")
  }

  /** #22 pivot_events — long→wide pivot on event_type with explicit pivot
    * values (no extra distinct-values job at scale). */
  def pivotEvents(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)).as("n"),
        sum(Det.e2(col("value"))).as("v2"))
    val valueCols = eventTypes.flatMap { t =>
      Seq(coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
        (col(s"${t}_v2").cast("double") / lit(100.0)).as(s"${t}_value"))
    }
    pivoted.select(col("user_id") +: valueCols: _*).orderBy("user_id")
  }

  /** #22b unpivot_events — wide→long, the inverse of pivot_events: the
    * per-type count columns melt back to (user_id, event_type, n) rows
    * through the native unpivot (an Expand: one pass, no join, rows×types
    * output). Zero-count combinations are kept — unpivot is lossless over
    * the pivoted frame. */
  def unpivotEvents(s: SparkSession, dir: String): DataFrame =
    pivotEvents(s, dir)
      .unpivot(
        Array(col("user_id")),
        eventTypes.map(t => col(s"${t}_n")).toArray,
        "event_type", "n")
      .withColumn("event_type", regexp_replace(col("event_type"), "_n$", ""))
      .orderBy("user_id", "event_type")

  /** #17b window_time_range — event-time RANGE frame: count + exact-cents
    * sum of each user's events in the trailing 30 minutes. Unlike a ROWS
    * frame, the window is bounded by the ordering VALUE, the shape used
    * for rate-limiting / rolling-rate features. Partitioned by the bounded
    * user key — no global sort. */
  def windowTimeRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-1800L * 1000000L, 0L)
    Tables.eventsUs(s, dir)
      .withColumn("n_30m", count(lit(1)).over(w))
      .withColumn("sum_30m", sum(Det.e2(col("value"))).over(w).cast("double") / lit(100.0))
      .select("event_id", "user_id", "us", "n_30m", "sum_30m")
      .orderBy("user_id", "us", "event_id")
  }

  /** #23 sessionize — 30-minute-gap sessionization via lag + running sum
    * over the bounded user_id key (the batch twin of stateful streaming
    * sessionization; state per user is O(1)). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .select("event_id", "user_id", "session_id")
      .orderBy("user_id", "us", "event_id")

  /** Shared sessionization core: every event with its session label and
    * the (us, value) columns downstream rollups need. */
  private def sessionized(s: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsUs(s, dir)
      .withColumn("prev", lag(col("us"), 1).over(wLag))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
  }

  /** #23g sessionize_stats — per-session rollup composed ON the session
    * labels: event count, duration, exact-cents value total, start time.
    * The added groupBy keys on (user_id, session_id) — the same user_id
    * key family the sessionize window already hash-partitioned on, so
    * the partial agg runs on co-located data. */
  def sessionizeStats(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        min(col("us")).as("start_us"),
        Det.sumE2(col("value")).as("total_value"))
      .orderBy("user_id", "session_id")

  /** #19j scd2_history — type-2 slowly-changing-dimension build from a
    * change log: collapse consecutive identical states per key, emit one
    * versioned row per state RUN with [valid_from, valid_to) bounds and a
    * current flag — the CDC→warehouse-dimension operator. Both windows
    * share one (user_id) partitioning and (us, event_id) order, so the
    * plan is ONE keyed shuffle + one sort reused across lag/lead/
    * row_number; state per key is O(1), no global sort. */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.eventsUs(s, dir)
      .select(col("event_id"), col("user_id"),
        col("event_type").as("state"), col("us"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("state"), col("us").as("valid_from_us"),
        col("valid_to_us"), col("version"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** #13c gap_fill — calendar densification: per-priority daily order
    * counts with explicit zero rows for missing days. The spine is
    * sequence(min_day, max_day) × distinct priorities, generated from a
    * single-row broadcast aggregate (never a driver collect) and joined
    * to the PRE-aggregated daily frame — the fill cost scales with
    * days×groups, not with the fact.
    *
    * The tiny daily aggregate is persisted so its three consumers cost
    * ONE fact scan (Spark has no CTE sharing; unpersisted, Catalyst
    * plans three column-pruned fact scans). Caller-clears contract as
    * elsewhere in the repo: the entry points (Verify/Bench/TimeQ) run
    * `spark.catalog.clearCache()` after consuming each query. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"), Det.sumE2(col("o_totalprice")).as("revenue"))
      .persist()
    // span and group set derive from the ALREADY-aggregated daily frame
    // (every order lands in daily, so min/max/distinct agree with the
    // fact).
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select(col("priority")).distinct()
      .crossJoin(broadcast(span))
      .select(col("priority"), explode(sequence(col("d0"), col("d1"))).as("d"))
    spine.join(daily, Seq("priority", "d"), "left")
      .select(col("priority"), col("d").cast("timestamp_ntz").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("priority", "day")
  }

  /** #13d rolling_revenue — 7-day trailing revenue per priority, composed
    * ON TOP of the gap-filled calendar: density makes ROWS(-6,0) equal to
    * a 7-day RANGE frame, and the window runs over the tiny aggregated
    * frame (days × priorities), never the fact. The rolling sum is an
    * integer-cents sum divided once at the edge — window accumulation
    * order can't perturb the double. */
  def rollingRevenue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("priority").orderBy("day").rowsBetween(-6, 0)
    gapFill(s, dir)
      .withColumn("cents", floor(col("revenue") * lit(100.0) + lit(0.5)))
      .select(col("priority"), col("day"), col("n_orders"),
        (sum(col("cents")).over(w).cast("double") / lit(100.0)).as("rev_7d"),
        sum(col("n_orders")).over(w).as("orders_7d"))
      .orderBy("priority", "day")
  }

  /** #19l mode_agg — modal value per key (most frequent event_type per
    * user, ties to the lexicographically smallest): count per (key,
    * value) with map-side partial agg, then a row_number over the
    * per-key COUNTS frame — the window input is already collapsed to
    * #distinct values per key, so the sort is over a bounded set, not
    * the fact. */
  def modeAgg(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("event_type"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("n_types", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("cnt"),
        col("n_types"))
      .orderBy("user_id")
  }

  /** #19k quantile_buckets — decile bucketing by document length done the
    * 100 TB way: the fact first COLLAPSES to a (n_chars, count) histogram
    * on a normal partial-agg shuffle, then ONE frequency-weighted exact
    * percentile over that collapsed frame yields the interpolated decile
    * boundaries — identical doubles to percentile-over-rows (same counts
    * map, same interpolation), but the aggregation buffer holds one entry
    * per DISTINCT length (bounded by the length domain, ~10^5 entries at
    * any corpus size), never one per row. Boundaries broadcast back onto
    * the rows, each row assigned by counting boundaries strictly below
    * its value, then per-bucket stats. Two scans, zero global sort —
    * where ntile() would drag every row through a single-partition
    * window, and a row-fed exact percentile would buffer ~10^11 values
    * per partial at 100 TB. */
  def quantileBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bounds = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
      .agg(percentile(col("n_chars"), typedLit((1 to 9).map(_ / 10.0)),
        col("cnt")).as("bs"))
    docs.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_chars"),
        aggregate(col("bs"), lit(1),
          (acc, b) => acc + when(col("n_chars").cast("double") > b, 1).otherwise(0))
          .cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bucket")
  }

  /** #23l merge_upsert — CDC MERGE semantics (the Delta/Iceberg `MERGE
    * INTO` kernel) expressed as ONE latest-wins changeset reduction plus
    * ONE full-outer join: the changeset (derived here from orders —
    * latest order per custkey, tie-broken on orderkey) collapses to a
    * single row per target key (`WHEN MATCHED UPDATE` → new balance,
    * `'F'`-status → `WHEN MATCHED DELETE`, urgent-priority → `WHEN NOT
    * MATCHED INSERT` under an offset key), then applies onto the
    * customer base: deletes drop, updates overwrite, inserts append,
    * untouched base rows pass through.
    *
    * Scale design: the latest-wins reduction is a partial-agg-friendly
    * window on the change key (at 100 TB the changeset is the SMALL side
    * — a day's CDC feed vs the full table, so AQE broadcasts it and the
    * base never shuffles); when both sides are large the full-outer
    * sort-merge join shuffles each side once on the key, and a base
    * table BUCKETED on the key makes the merge shuffle-free on the base
    * side — the exact layout Delta's MERGE optimizes toward. No
    * driver-side state; every MERGE branch is one codegen'd CASE. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        when(col("o_orderpriority") === "1-URGENT",
          col("o_custkey") + lit(1000000L)).otherwise(col("o_custkey")).as("key"),
        when(col("o_orderstatus") === "F", lit("D"))
          .when(col("o_orderpriority") === "1-URGENT", lit("I"))
          .otherwise(lit("U")).as("op"),
        col("o_totalprice").as("new_bal"))
    Tables.customer(s, dir)
      .select(col("c_custkey").as("key"), col("c_name"), col("c_acctbal"))
      .join(changes, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("key"),
        coalesce(col("c_name"), concat(lit("cust#"), col("key"))).as("name"),
        when(col("op").isNotNull, col("new_bal")).otherwise(col("c_acctbal"))
          .as("acctbal"),
        when(col("op").isNull, lit("unchanged"))
          .when(col("c_name").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("src"))
      .orderBy("key")
  }
}
