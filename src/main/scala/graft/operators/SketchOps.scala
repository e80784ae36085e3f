package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable-sketch operators — the incremental-statistics layer a 100 TB
  * store needs: land a small sketch per ingest partition once, answer
  * "distinct users so far" forever after by merging sketches, never by
  * rescanning history.
  *
  * Uses Spark's built-in Apache DataSketches HLL expressions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`). Two
  * properties make the design sound:
  *   - HLL union is register-wise max, so (at the same lgK) the union of
  *     per-partition sketches is BIT-IDENTICAL to the sketch of the whole
  *     input — merging partials loses nothing (spec-asserted).
  *   - A sketch is a few KB regardless of input size: per-day landings are
  *     model metadata, not data — broadcastable, cheap to store, cheap to
  *     re-merge for any date range.
  *
  * Complements [[graft.CoreOps]]'s `approx_distinct` (one-shot HLL++
  * estimate): these sketches are REUSABLE state, the difference between
  * "estimate once" and "maintain a distinct count incrementally".
  */
object SketchOps {

  val DefaultLgK = 14 // ~0.8% relative standard error, 16 KB per sketch

  private def eventsWithDay(s: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(s, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("dt"))

  /** `hll_distinct` query (rows-only: estimates are DataSketches-specific,
    * deterministic but not reproducible in the DuckDB oracle) — per
    * event_type: exact distinct users, the direct HLL estimate, and the
    * estimate recovered by merging per-DAY partial sketches. The last two
    * columns being equal is the incremental-landing contract in one row.
    */
  def hllDistinct(s: SparkSession, dir: String, lgK: Int = DefaultLgK): DataFrame = {
    val ev = eventsWithDay(s, dir)
    val direct = ev.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact_users"),
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lgK)).as("approx_users"))
    val daily = ev.groupBy("event_type", "dt")
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sketch"))
    val merged = daily.groupBy("event_type").agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("merged_users"),
      count(lit(1)).as("n_partials"))
    direct.join(merged, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("approx_users"),
        col("merged_users"), col("n_partials"))
      .orderBy("event_type")
  }

  /** Per-(dt, event_type) HLL sketches over user_id. One row per partition
    * per group — the frame a daily ingest job appends from its own day's
    * data only. */
  def dailySketches(s: SparkSession, dir: String, lgK: Int = DefaultLgK): DataFrame =
    eventsWithDay(s, dir)
      .groupBy("dt", "event_type")
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sketch"),
        lit(lgK).as("lg_k"))

  /** Land the per-day sketches dt-partitioned. Dynamic partition overwrite:
    * re-landing one day replaces exactly that day's sketch rows, so a
    * late-data re-run of day N never touches days != N. */
  def landDistinctSketches(s: SparkSession, dir: String, outBase: String,
      lgK: Int = DefaultLgK): Unit =
    dailySketches(s, dir, lgK).write
      .partitionBy("dt")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(outBase)

  /** Merge landed sketches → per-event_type distinct estimate. Cost is
    * O(#sketches) — days × groups — independent of the event volume the
    * sketches summarize. */
  def mergeDistinctSketches(s: SparkSession, outBase: String): DataFrame =
    s.read.parquet(outBase)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("approx_users"))
      .orderBy("event_type")

  /** quantile_sketch — the quantile analogue of [[hllDistinct]]: per
    * priority, p50/p90/p99 of order cents from (a) ONE direct DDSketch
    * pass and (b) merging per-MONTH partial sketches — the landable
    * "maintain p99 incrementally" shape. The two estimate sets being
    * bit-equal is the incremental contract in one row (DDSketch merge is
    * bucket-wise add — exact below the collapse threshold). Quantile
    * extraction is an in-plan fold over the ≤[[graft.functions.DDSketch.MaxBins]]-entry
    * map — no UDF, no collect. Rows-only: the sketch estimates have no
    * DuckDB twin; SketchSpec proves the α-relative error bound against
    * exact per-group percentiles and merged == direct. */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DDSketch, DDSketchMerge}
    val dd = udaf(new DDSketch())
    val ddm = udaf(new DDSketchMerge())
    val o = Tables.orders(s, dir).select(
      col("o_orderpriority").as("priority"),
      graft.functions.Det.e2(col("o_totalprice")).cast("double").as("cents"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
    val direct = o.groupBy("priority").agg(dd(col("cents")).as("sk"))
    val merged = o.groupBy("priority", "m").agg(dd(col("cents")).as("sk"))
      .groupBy("priority")
      .agg(ddm(col("sk")).as("skm"), count(lit(1)).as("n_partials"))
    def qs(entries: org.apache.spark.sql.Column, suffix: String) = Seq(
      DDSketch.quantileFromEntries(entries, 0.5).as(s"p50_$suffix"),
      DDSketch.quantileFromEntries(entries, 0.9).as(s"p90_$suffix"),
      DDSketch.quantileFromEntries(entries, 0.99).as(s"p99_$suffix"))
    direct.join(merged, Seq("priority"))
      // sort each sketch's entries ONCE; the three extractions per
      // sketch then fold the same sorted array
      .select(col("priority"), col("n_partials"),
        DDSketch.sortedEntries(col("sk")).as("ed"),
        DDSketch.sortedEntries(col("skm")).as("em"))
      .select(col("priority") +: (qs(col("ed"), "direct") ++
        qs(col("em"), "merged") :+ col("n_partials")): _*)
      .orderBy("priority")
  }
}
