package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators — as-of join and interval (range) join.
  *
  * Spark has no native ASOF JOIN, and a naive range join plans as a
  * nested-loop (BroadcastNestedLoopJoin / CartesianProduct) that is
  * quadratic at scale. Both operators here re-express the semantics with
  * only equi-shuffles, per the preference order in the build charter:
  * compose existing ops before reaching for a custom SparkPlan.
  *
  *   - as-of: union both sides, ONE hash shuffle on the key, an ordered
  *     window carries the latest right-side row forward — the classic
  *     merge-as-of, O(n log n) per key partition, no join explosion.
  *   - range: explode each interval into the coarse time bins it covers,
  *     equi-join points on (key, bin), then apply the exact bounds. The
  *     shuffle key is (key, bin) so pair volume is bounded by true match
  *     density (+ one-bin slack), never |points| × |intervals|.
  *
  * The reference has no temporal joins; these are engine-completeness
  * operators for the events table (the bucket-timeline stand-in,
  * reference: Scripts/common/external_resources.py:70–98).
  */
object TemporalOps {

  /** Generic as-of join: for each left row, attach the latest right row of
    * the same `key` with `right.tsCol <= left.tsCol` (inclusive, LEFT
    * semantics — unmatched left rows keep a null struct).
    *
    * Right attributes travel in ONE non-null struct per right row, so a
    * null attribute value can never make `last(_, ignoreNulls)` skip over
    * a legitimate match to an older row.
    *
    * Scale: one shuffle on `key`, per-partition sort on (ts, side) — the
    * same cost shape as a sort-merge join, with bounded window state (the
    * running struct). No non-equi join anywhere in the plan.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      matchedCol: String = "matched"): DataFrame = {
    require(!left.columns.contains(matchedCol) && !left.columns.contains("_side"),
      s"asofJoin reserves columns '$matchedCol' and '_side' — rename them on the left side")
    val rAttrs = right.columns.filterNot(c => c == key || c == tsCol).toSeq
    val rPacked = right.select(
      col(key), col(tsCol),
      struct((col(tsCol) +: rAttrs.map(col)): _*).as(matchedCol))
    val matchedType = rPacked.schema(matchedCol).dataType
    val lAttrs = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val lPart = left.select(
      col(key) +: col(tsCol) +: lAttrs.map(col) :+
        lit(null).cast(matchedType).as(matchedCol) :+ lit(1).as("_side"): _*)
    val rPart = rPacked.select(
      col(key) +: col(tsCol) +:
        lAttrs.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(matchedCol) :+ lit(0).as("_side"): _*)
    // right (side 0) sorts BEFORE left (side 1) at equal ts → inclusive
    // `left.ts >= right.ts` match, same as DuckDB/kdb asof semantics.
    // The packed struct is the final sort key: if two right rows ever
    // share (key, ts), `last` deterministically picks the struct-largest
    // one instead of whichever the shuffle ordered last.
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"), col(matchedCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn(matchedCol, last(col(matchedCol), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Generic interval join: rows of `points` whose `ptCol` lies in a
    * `[loCol, hiCol)` interval of `intervals` with the same `key`.
    *
    * Each interval is exploded into the `binWidth`-sized time bins it
    * covers (⌈len/binWidth⌉+1 rows); each point carries its single bin.
    * The join is a plain equi-join on (key, bin) — hash-shuffleable,
    * AQE-skew-splittable — followed by the exact bounds filter. A point
    * matches an interval in exactly one bin (its own), so no dedup pass
    * is needed. Pick `binWidth` ≈ the typical interval length: shorter
    * bins explode intervals wider, longer bins admit more false
    * candidates to the filter.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
      ptCol: String, loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "rangeJoinBinned reserves the column name '_bin' — rename it on the inputs")
    // inverted interval (hi < lo): emit NO bins — `sequence` with start >
    // stop would otherwise generate a huge DESCENDING array (default step
    // -1) and can OOM an executor; such an interval matches nothing anyway
    val loDiv = expr(s"`$loCol` div $binWidth")
    val hiDiv = expr(s"`$hiCol` div $binWidth")
    val iBinned = intervals.withColumn("_bin",
      explode(when(hiDiv >= loDiv, sequence(loDiv, hiDiv))))
    val pBinned = points.withColumn("_bin", expr(s"`$ptCol` div $binWidth"))
    pBinned.join(iBinned, Seq(key, "_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_bin")
  }

  /** Multi-resolution (bin-ladder) interval join — the mixed-width
    * companion to [[rangeJoinBinned]]. Single-width binning must pick one
    * bin size: too small and WIDE intervals explode into thousands of
    * bins, too large and NARROW intervals drown in false candidates. The
    * ladder assigns each interval its own level l — the smallest power-of-
    * two multiple of `baseWidth` that covers its span — so every interval
    * emits AT MOST TWO (level, bin) rows regardless of width, while each
    * point probes one bin per level (a log-factor map-side fan-out of the
    * point side, no shuffle amplification beyond it). Join on
    * (key, level, bin) + the exact bounds; a pair can only meet at the
    * interval's single level, so no dedup pass is needed.
    */
  def rangeJoinLadder(points: DataFrame, intervals: DataFrame, key: String,
      ptCol: String, loCol: String, hiCol: String, baseWidth: Long,
      levels: Int = 16): DataFrame = {
    require(baseWidth > 0, "baseWidth must be positive")
    require(levels >= 0 && levels <= 40, "levels must be in [0, 40]")
    Seq("_lvl", "_bin").foreach { c =>
      require(!points.columns.contains(c) && !intervals.columns.contains(c),
        s"rangeJoinLadder reserves the column name '$c' — rename it on the inputs")
    }
    // level of an interval: smallest l with baseWidth·2^l ≥ span (clamped
    // to the ladder top — a wider-than-top interval still only emits the
    // bins sequence at the top level, ≥2 entries but bounded by span/top)
    val span = (col(hiCol) - col(loCol)).cast("double") / lit(baseWidth.toDouble)
    val lvl = least(lit(levels),
      greatest(lit(0), ceil(log(2.0, greatest(span, lit(1.0)))).cast("int")))
    // same inverted-interval guard as rangeJoinBinned: hi < lo → no bins
    val loDivL = expr(s"`$loCol` div ${widthSql(baseWidth)}")
    val hiDivL = expr(s"`$hiCol` div ${widthSql(baseWidth)}")
    val iBinned = intervals
      .withColumn("_lvl", lvl)
      .withColumn("_bin", explode(when(hiDivL >= loDivL, sequence(loDivL, hiDivL))))
    val pBinned = points
      .withColumn("_lvl", explode(sequence(lit(0), lit(levels))))
      .withColumn("_bin", expr(s"`$ptCol` div ${widthSql(baseWidth)}"))
    pBinned.join(iBinned, Seq(key, "_lvl", "_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_lvl", "_bin")
  }

  /** SQL fragment for the level-dependent bin width (references `_lvl`). */
  private def widthSql(baseWidth: Long): String =
    s"shiftleft(CAST($baseWidth AS BIGINT), _lvl)"

  private val HalfHourUs = 1800L * 1000000L

  /** Native as-of join over graft's custom physical operator
    * ([[graft.plans.AsOfJoinExec]] — one exchange per side, in-partition
    * sort, single forward merge pass). Same semantics as [[asofJoin]]
    * (inclusive `right.ts <= left.ts`, LEFT, ties to the tiebreak-largest
    * right row) with a cheaper plan: no unioned wide schema and no window
    * state — the right side streams through one buffered row.
    *
    * Column names must be disjoint between the sides (rename on the right,
    * which also keeps a self-join's attribute ids distinct). The strategy
    * is installed idempotently on the session, so this works on sessions
    * graft did not build (the driver's) as well as extension-built ones.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      rightTiebreak: Seq[String] = Nil, nearest: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"asofJoinNative requires disjoint column names; rename on the right side: ${overlap.mkString(", ")}")
    val s = left.sparkSession
    PlanBridge.ensureStrategy(s, graft.plans.AsOfJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    val node = graft.plans.AsOfJoin.resolved(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightTiebreak.map(attr(rPlan, _)), nearest)
    PlanBridge.ofRows(s, node)
  }

  /** `asof_nearest_native` query — [[asofNearest]]'s argmin semantics on
    * the native exec's nearest direction: one buffered past row + a
    * peeked future row per partition instead of two window passes over
    * the tagged union. p_event (unique) is the full tiebreak, so the
    * output is bit-identical to the window twin and shares asof_nearest's
    * brute-force-ranked DuckDB oracle. Clicks with no purchase drop
    * (join-style, as the oracle's inner join). */
  def asofClickPurchaseNearestNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"),
        col("event_id").as("p_event"))
    asofJoinNative(clicks, purchases, "user_id", "p_user", "us", "p_us",
        rightTiebreak = Seq("p_event"), nearest = true)
      .filter(col("p_event").isNotNull)
      .select(col("event_id"), col("user_id"), col("us"),
        col("p_event"), col("p_us"),
        abs(col("p_us") - col("us")).as("delta_us"),
        when(col("p_us") <= col("us"), "past").otherwise("future")
          .as("direction"))
      .orderBy("event_id")
  }

  /** `asof_join_native` query — the [[asofClickPurchase]] semantics on the
    * native exec; shares asof_join's DuckDB ASOF oracle. The right-side
    * tiebreak (p_event, p_value) mirrors the window twin's struct order,
    * so the two operators are bit-identical even on (key, ts) ties. */
  def asofClickPurchaseNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"),
        col("event_id").as("p_event"), col("value").as("p_value"))
    asofJoinNative(clicks, purchases, "user_id", "p_user", "us", "p_us",
        rightTiebreak = Seq("p_event", "p_value"))
      .select(col("event_id"), col("user_id"), col("us"),
        col("p_event"), col("p_value"), col("p_us"))
      .orderBy("event_id")
  }

  /** `asof_join` query — each click joined to the user's latest purchase
    * at or before it (event-time in epoch-µs, matching the oracle's
    * ns→µs truncation). */
  def asofClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"),
        col("event_id").as("p_event"), col("value").as("p_value"))
    asofJoin(clicks, purchases, "user_id", "us", "m")
      .select(col("event_id"), col("user_id"), col("us"),
        col("m.p_event").as("p_event"), col("m.p_value").as("p_value"),
        col("m.us").as("p_us"))
      .orderBy("event_id")
  }

  /** `range_join` query — clicks falling inside the 30-minute window
    * opened by each purchase of the same user. */
  def rangeClickInPurchaseWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id"), col("us"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event"),
        col("us").as("w_lo"), (col("us") + lit(HalfHourUs)).as("w_hi"))
    rangeJoinBinned(clicks, windows, "user_id", "us", "w_lo", "w_hi", HalfHourUs)
      .select("p_event", "c_event", "us", "w_lo")
      .orderBy("p_event", "c_event")
  }

  /** asof_nearest — nearest-direction as-of join (pandas merge_asof
    * direction='nearest'): each click matches the purchase of the same
    * user minimizing (|Δt|, p_us, p_event) — a UNIFORM argmin key, so
    * ties (past vs future at equal distance, simultaneous purchases)
    * resolve identically in the window algorithm here and the
    * brute-force oracle. The global argmin is always either the latest
    * at-or-before purchase or the earliest after — so ONE user_id
    * exchange + two in-partition sorted windows (backward last, forward
    * first over the tagged union) replace any join: cost O(n log n) per
    * user partition, never clicks × purchases. */
  def asofNearest(s: SparkSession, dir: String): DataFrame =
    asofNearestEvents(Tables.eventsUs(s, dir))

  /** Core on any events-shaped frame (testable / probe-able). */
  def asofNearestEvents(ev: DataFrame): DataFrame = {
    val tagged = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("us"),
        when(col("event_type") === "purchase", 0L).otherwise(1L).as("kind_b"),
        when(col("event_type") === "purchase", col("event_id")).as("p_event_src"),
        when(col("event_type") === "purchase", col("us")).as("p_us_src"))
      .withColumn("kind_f", lit(1L) - col("kind_b"))
    // backward: purchases sort BEFORE a same-us click (kind_b), latest us
    // wins, then SMALLEST event id (event_id desc ⇒ last row = min id)
    val wB = Window.partitionBy("user_id")
      .orderBy(col("us"), col("kind_b"), col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: purchases sort AFTER a same-us click (kind_f), earliest us
    // wins, then smallest event id
    val wF = Window.partitionBy("user_id")
      .orderBy(col("us"), col("kind_f"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withCands = tagged
      .withColumn("b_event", last(col("p_event_src"), ignoreNulls = true).over(wB))
      .withColumn("b_us", last(col("p_us_src"), ignoreNulls = true).over(wB))
      .withColumn("f_event", first(col("p_event_src"), ignoreNulls = true).over(wF))
      .withColumn("f_us", first(col("p_us_src"), ignoreNulls = true).over(wF))
    val bKey = struct(abs(col("b_us") - col("us")), col("b_us"), col("b_event"))
    val fKey = struct(abs(col("f_us") - col("us")), col("f_us"), col("f_event"))
    val takeB = col("f_event").isNull || (col("b_event").isNotNull && bKey <= fKey)
    withCands.filter(col("kind_b") === 1L)
      .filter(col("b_event").isNotNull || col("f_event").isNotNull)
      .select(col("event_id"), col("user_id"), col("us"),
        when(takeB, col("b_event")).otherwise(col("f_event")).as("p_event"),
        when(takeB, col("b_us")).otherwise(col("f_us")).as("p_us"))
      .withColumn("delta_us", abs(col("p_us") - col("us")))
      .withColumn("direction",
        when(col("p_us") <= col("us"), "past").otherwise("future"))
      .orderBy("event_id")
  }

  /** time_weighted_avg — the state-held-until-next-sample mean (sensor /
    * gauge semantics, TimescaleDB's time_weight): each event's value is
    * held until the user's next event; the per-user TWA weights each
    * value by its holding duration. Last events (no successor) carry
    * zero weight — the held-interval convention. Exact arithmetic: cents
    * × µs-duration products sum as DECIMAL(38,0) (a 10⁸-cent value held
    * 10¹² µs already overflows a long), ONE division at the edge.
    * Shape: lead over the user_id window + a groupBy on the SAME key
    * family — one exchange total. */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.eventsUs(s, dir)
      .withColumn("next_us", lead(col("us"), 1).over(wOrd))
      .filter(col("next_us").isNotNull)
      .select(col("user_id"),
        graft.functions.Det.e2(col("value")).cast("decimal(38,0)").as("cents"),
        (col("next_us") - col("us")).cast("decimal(38,0)").as("dur"))
      .groupBy("user_id")
      .agg(sum(col("cents") * col("dur")).as("wsum"),
        sum(col("dur")).as("wtot"),
        count(lit(1)).as("n_intervals"))
      .select(col("user_id"), col("n_intervals"),
        col("wtot").cast("long").as("held_us"),
        (col("wsum").cast("double") / col("wtot").cast("double") / lit(100.0))
          .as("twa"))
      .orderBy("user_id")
  }

  /** merge_intervals — gaps-and-islands: coalesce each user's overlapping
    * half-open purchase windows [us, us+30 min) into maximal covered
    * spans. New island when an interval starts at-or-after the running
    * max end of every EARLIER interval (half-open ⇒ touching intervals
    * merge is false: [a,b)+[b,c) are disjoint, so `>=` starts a new one);
    * island id is the running count of starts. The time-in-state /
    * coverage operator (uptime, exposure, dedup of retry windows).
    *
    * Shape at scale: ONE hash exchange on user_id feeds both windows and
    * the final groupBy (same key family — no second shuffle); the sort is
    * in-partition. All-long arithmetic → exact oracle twin. */
  def mergeIntervals(s: SparkSession, dir: String): DataFrame =
    mergeIntervalsEvents(Tables.eventsUs(s, dir))

  /** Core on any events-shaped frame (testable / probe-able). */
  def mergeIntervalsEvents(ev: DataFrame): DataFrame = {
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us").as("lo"),
        (col("us") + lit(HalfHourUs)).as("hi"))
    val wOrd = Window.partitionBy("user_id").orderBy(col("lo"), col("event_id"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("prev_max_hi", max(col("hi")).over(wPrev))
      .withColumn("is_new",
        when(col("prev_max_hi").isNull || col("lo") >= col("prev_max_hi"), 1L)
          .otherwise(0L))
      .withColumn("island_id", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "island_id")
      .agg(min(col("lo")).as("start_us"), max(col("hi")).as("end_us"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "island_id")
  }
}
