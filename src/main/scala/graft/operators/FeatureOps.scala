package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** Feature-generation / mining operators for the ML-training side of the
  * engine: per-key lag features, exact rank normalization, fuzzy
  * vocabulary matching, co-occurrence mining, and conversion attribution.
  *
  * The reference's surface stops at aggregate analytics
  * (steam_prices_transformer.py / world_map_transformer.py); these are
  * the operations a training-data pipeline layers on top, expressed so
  * each one is a bounded number of keyed shuffles with no driver-side
  * loops — the same plans hold at 100 TB.
  */
object FeatureOps {

  /** lag_features — per-user event history features: previous value,
    * delta, inter-event gap, and trailing-3 aggregates. One keyed window
    * (a single hash exchange on user_id + in-partition sort); every
    * output is an exact integer (cents / microseconds), so the frame
    * hash-compares bit-identically with the SQL twin. The classic
    * feature-engineering frame for churn/LTV models. */
  def lagFeatures(s: SparkSession, dir: String): DataFrame =
    lagFeaturesFrom(Tables.eventsUs(s, dir))

  /** Core on any (event_id, user_id, event_type, us, value) frame. */
  def lagFeaturesFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val w3 = w.rowsBetween(-3, -1)
    ev
      .withColumn("cents", Det.e2(col("value")).cast("long"))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("us"), col("cents"),
        lag(col("cents"), 1).over(w).as("prev_cents"),
        (col("cents") - lag(col("cents"), 1).over(w)).as("delta_cents"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        count(lit(1)).over(w3).as("n_prev3"),
        sum(col("cents")).over(w3).as("sum_prev3_cents"))
      .orderBy("event_id")
  }

  /** rank_normalize — exact per-source percent_rank of document length
    * (rank-normalizing a quality signal to [0,1] before mixing sources).
    *
    * NOT a window over the fact: percent_rank partitioned by source
    * would sort each source in a single task (severe skew at corpus
    * scale). Instead ranks are computed on the COLLAPSED frame of
    * distinct (source, n_chars) pairs — bounded by the value domain, not
    * the corpus — and broadcast-joined back, reproducing the SQL
    * `percent_rank()` tie convention exactly: rank = 1 + #values
    * strictly below, pr = (rank-1)/(N-1), pr = 0 for a single-row
    * partition. Every division has exact-integer operands → bitwise
    * deterministic. */
  def rankNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
    val counts = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val wsrc = Window.partitionBy("source").orderBy("n_chars")
    val ranked = counts
      .withColumn("below", coalesce(
        sum(col("c")).over(wsrc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("ntot", sum(col("c")).over(Window.partitionBy("source")))
    val pr = when(col("ntot") > 1,
      col("below").cast("double") / (col("ntot") - 1).cast("double"))
      .otherwise(lit(0.0))
    docs.join(broadcast(ranked), Seq("source", "n_chars"))
      .select(col("doc_id"), col("source"), col("n_chars"), pr.as("pr"),
        least(floor(pr * 10).cast("long"), lit(9L)).as("decile"))
      .orderBy("doc_id")
  }

  /** Edit-distance ceiling for [[stringSimJoin]] and its length blocking. */
  val FuzzyMaxEdit = 2
  /** Minimum token length admitted to the fuzzy vocabulary. */
  val FuzzyMinLen = 4

  /** string_sim_join — near-identical token pairs in the corpus
    * vocabulary (misspelling / variant detection before token-level
    * dedup). Levenshtein ≤ d implies |len(a)−len(b)| ≤ d, so the left
    * side expands each token to its 2d+1 admissible length keys and the
    * candidate join is a pure EQUI-join on that key — vocabulary-sized,
    * never a cartesian (the explode is (2d+1)× the vocabulary, not the
    * corpus). Each unordered pair matches on exactly one key, so no
    * dedup pass is needed. */
  def stringSimJoin(s: SparkSession, dir: String): DataFrame =
    stringSimPairs(
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) >= FuzzyMinLen)
        .distinct())

  /** Core on any single-column `tok` vocabulary frame (testable). */
  def stringSimPairs(vocab: DataFrame): DataFrame = {
    val left = vocab.select(col("tok").as("a"),
      explode(array((-FuzzyMaxEdit to FuzzyMaxEdit).map(d =>
        length(col("tok")) + d): _*)).as("lkey"))
    val right = vocab.select(col("tok").as("b"), length(col("tok")).as("lkey"))
    left.join(right, "lkey")
      .where(col("a") < col("b"))
      // compute the O(|a|·|b|) distance ONCE: filter and projection are
      // separate operators, so a repeated call would evaluate twice
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= FuzzyMaxEdit)
      .select("a", "b", "dist")
      .orderBy("a", "b")
  }

  /** cooccurrence_pairs — which event types co-occur in the same
    * (user, day) context, with lift (market-basket association on the
    * behavioral fact). The self-join runs AFTER collapsing to distinct
    * (user, day, type), so per-group candidates are bounded by the
    * event-type vocabulary (≤ C(V,2) pairs per context, never row²);
    * global counts ride broadcasts. lift = P(a,b)/(P(a)P(b)) is computed
    * as one division of exact integer products.
    *
    * The collapsed contexts frame feeds FOUR consumers (both self-join
    * sides, the per-type counts, the group count), so it is persisted —
    * one fact scan + one distinct shuffle total instead of four of each
    * (the dailyRevenue/postingList pattern; Spark has no CTE sharing and
    * exchange reuse does not cross the differing agg shapes). Contract:
    * the caller drops it (Bench/Verify clearCache between queries). */
  def cooccurrencePairs(s: SparkSession, dir: String): DataFrame =
    cooccurrencePairsFrom(Tables.eventsMicros(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type")))

  /** Core on any (user_id, d, event_type) context frame. */
  def cooccurrencePairsFrom(contexts: DataFrame): DataFrame = {
    val ud = contexts.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = ud.as("x").join(ud.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.d") === col("y.d") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val typeCounts = ud.groupBy("event_type").agg(count(lit(1)).as("c"))
    val g = ud.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("n_groups"))
    pairs
      .join(broadcast(typeCounts.select(col("event_type").as("a"), col("c").as("ca"))), "a")
      .join(broadcast(typeCounts.select(col("event_type").as("b"), col("c").as("cb"))), "b")
      .join(broadcast(g))
      .select(col("a"), col("b"), col("n_ab"),
        ((col("n_ab") * col("n_groups")).cast("double") /
          (col("ca") * col("cb")).cast("double")).as("lift"))
      .orderBy("a", "b")
  }

  /** attribution_last_touch — last-touch conversion attribution: each
    * purchase credits the user's most recent preceding non-purchase
    * event ('none' if the purchase opens the history). One keyed window
    * with a running last(ignoreNulls) — streaming frame, no buffering —
    * then a partial-agg shuffle on the (≤ event-vocabulary) touch key.
    * Attributed value sums exact cents. */
  def attributionLastTouch(s: SparkSession, dir: String): DataFrame =
    attributionTouches(
      Tables.eventsUs(s, dir)
        .withColumn("cents", Det.e2(col("value")).cast("long")))
      .groupBy("touch")
      .agg(count(lit(1)).as("n_conversions"),
        (sum(col("cents")).cast("double") / lit(100.0)).as("attributed_value"))
      .orderBy("touch")

  /** trend_agg — per-priority revenue trend: ordinary-least-squares
    * slope/intercept of monthly revenue over the month index (the
    * seasonality/decay feature a forecasting model consumes). Months
    * collapse first (one partial-agg shuffle; the regression then runs
    * over ≤ calendar-months rows per group), and every OLS moment
    * (n, Σx, Σy, Σxy, Σx²) is an EXACT integer — x is a month ordinal,
    * y exact cents — so the two edge divisions are deterministic.
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = (Σy − m·Σx)/n,
    * association mirrored in the SQL twin. */
  def trendAgg(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(Det.e2(col("o_totalprice")).cast("long")).as("y"))
    // y-bearing moments in DECIMAL(38) (the corrAgg pattern): monthly
    // cents at corpus scale × month ordinals can pass 2⁶³ in Σxy;
    // x-only moments stay long (ordinals are tiny)
    val yd = col("y").cast("decimal(38,0)")
    val m = monthly.groupBy("priority")
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).as("sx"), sum(yd).as("sy"),
        sum(col("x") * yd).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // a single-month group has zero x-variance: no trend is defined —
    // emit null, never 0/0 NaN (whose division semantics also differ
    // between engines)
    val denom = m("n_months") * col("sxx") - col("sx") * col("sx")
    val slope = when(denom =!= 0,
      (m("n_months") * col("sxy") - col("sx") * col("sy")).cast("double") /
        denom.cast("double"))
    m.withColumn("slope_cents", slope)
      .withColumn("intercept_cents",
        (col("sy").cast("double") - col("slope_cents") * col("sx").cast("double")) /
          col("n_months").cast("double"))
      .select("priority", "n_months", "slope_cents", "intercept_cents")
      .orderBy("priority")
  }

  /** ab_test — Welch's t between two user cohorts (id parity) on
    * per-user purchase value: the experimentation-analysis readout.
    * The experimental UNIT is the user (per-user totals first — never
    * per-event rows, which would pseudo-replicate), so the plan is one
    * user-keyed partial-agg shuffle, then one 2-row cohort agg of exact
    * integer moments (n, Σx, Σx²). Mean/variance/t derive from those
    * moments with the SAME association as the SQL twin; sqrt is
    * IEEE-exact, so even the t statistic hash-compares. Sample variance
    * uses the n−1 denominator; cohorts of one user emit null t. */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(Det.e2(col("value")).cast("long")).as("x"))
      .withColumn("cohort",
        when(col("user_id") % 2 === 0, "control").otherwise("treatment"))
    // DECIMAL(38) moments (the corrAgg pattern): Σx² over per-user cent
    // totals overflows Long at corpus scale (1e8-cent whales squared ×
    // 1e6 users > 2⁶³); decimal sums stay exact to petabyte scale and
    // the oracle mirrors with HUGEINT
    val xd = col("x").cast("decimal(38,0)")
    val m = perUser.groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum(xd).as("sx"),
        sum(xd * xd).as("sxx"))
    val mean = col("sx").cast("double") / col("n")
    val variance = when(col("n") > 1,
      (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n")) /
        (col("n") - 1))
    val stats = m.select(col("cohort"), col("n"), mean.as("mean_cents"),
      variance.as("var_cents"))
    val a = stats.where(col("cohort") === "control")
      .select(col("n").as("n_a"), col("mean_cents").as("mean_a"),
        col("var_cents").as("var_a"))
    val b = stats.where(col("cohort") === "treatment")
      .select(col("n").as("n_b"), col("mean_cents").as("mean_b"),
        col("var_cents").as("var_b"))
    a.join(b)
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        (col("mean_b") - col("mean_a")).as("lift_cents"),
        ((col("mean_b") - col("mean_a")) /
          sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
          .as("t_stat"))
  }

  /** Per-purchase touch assignment on any (user_id, event_id, us,
    * event_type, cents) frame — the pre-aggregation core, shared with
    * the streaming twin's equivalence spec
    * ([[graft.streaming.EventStreams.attributionStream]]). */
  def attributionTouches(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(
      when(col("event_type") =!= "purchase", col("event_type")),
      ignoreNulls = true).over(w)
    ev.withColumn("touch", coalesce(touch, lit("none")))
      .where(col("event_type") === "purchase")
  }
}
