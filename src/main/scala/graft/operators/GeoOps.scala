package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spatial join — the 2-D generalization of the binned range join
  * (plans/RangeJoinRule.scala): point-in-box containment via grid-cell
  * bucketing, never a cartesian.
  *
  * Spark has no spatial join operator; the naive formulation is a
  * BroadcastNestedLoopJoin (points × regions). Here every region emits
  * the handful of fixed-size grid cells its box overlaps, every point
  * emits the one cell it falls in, and the candidate join is a pure
  * EQUI-join on the cell key — candidates per point are bounded by the
  * regions overlapping one cell, then exact containment filters. This is
  * how geospatial engines (and the reference's geopandas sjoin would at
  * scale) shard the planet: cells play the role of the range join's
  * bins. Cell size is chosen ≥ half the box edge so a box spans ≤ 3×3
  * cells — fan-out is a small constant, and the cell key hash-shuffles
  * both sides once.
  *
  * Geometry here is synthesized from pure arithmetic (nation key → box,
  * event id → point) so the whole operator — unlike the xxhash-derived
  * render-path geometry — is ANSI-expressible and the DuckDB oracle
  * verifies the full containment semantics, not just row shapes.
  */
object GeoOps {
  // every geometry constant lives HERE and is interpolated into the
  // oracle SQL (the QueryModulus lesson: duplicated literals drift)
  val BoxW = 50.0; val BoxH = 24.0    // region box size (degrees)
  val CellW = 30.0; val CellH = 14.0  // grid cell size (≥ half a box edge)
  val GridCols = 6                    // box layout: 6 per lon row
  val LonSpacing = 60; val LatSpacing = 28  // > box size ⇒ disjoint boxes
  val LonBase = -180; val LatBase = -84
  val PxMod = 36000L; val PyMul = 7919L; val PyMod = 18000L

  /** Deterministic region boxes: one per nation, laid out on a
    * [[GridCols]]-wide lon/lat grid with gaps. */
  def nationBoxes(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_nationkey"), col("n_name"),
      ((col("n_nationkey") % GridCols) * LonSpacing + LonBase)
        .cast("double").as("lon0"),
      // `div`, not `/`: Spark's / on integrals is true (double) division
      (expr(s"CAST(n_nationkey AS BIGINT) div $GridCols") * LatSpacing + LatBase)
        .cast("double").as("lat0"))

  /** Deterministic event points: id-derived lon/lat covering the globe. */
  def eventPoints(s: SparkSession, dir: String): DataFrame =
    pointsFrom(Tables.events(s, dir))

  /** Point derivation on any frame with an event_id column (shared with
    * ScaleProbe so the probe and the operator can never diverge). */
  def pointsFrom(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      ((col("event_id") % PxMod).cast("double") / 100.0 - 180.0).as("px"),
      (((col("event_id") * PyMul) % PyMod).cast("double") / 100.0 - 90.0).as("py"))

  /** spatial_join — events-per-region counts via the grid-bucketed
    * containment join. */
  def spatialJoin(s: SparkSession, dir: String): DataFrame =
    spatialJoinFrames(nationBoxes(s, dir), eventPoints(s, dir))
      .groupBy("n_nationkey", "n_name")
      .agg(count(lit(1)).as("n_points"))
      .orderBy("n_nationkey")

  /** Core: containment pairs (point, region) on any boxes/points frames
    * with the schema above — grid equi-join + exact filter. */
  def spatialJoinFrames(boxes: DataFrame, points: DataFrame): DataFrame = {
    val cellsX = sequence(floor(col("lon0") / CellW).cast("long"),
      floor((col("lon0") + lit(BoxW)) / CellW).cast("long"))
    val cellsY = sequence(floor(col("lat0") / CellH).cast("long"),
      floor((col("lat0") + lit(BoxH)) / CellH).cast("long"))
    val b = boxes
      .withColumn("cx", explode(cellsX))
      .withColumn("cy", explode(cellsY))
    val p = points
      .withColumn("cx", floor(col("px") / CellW).cast("long"))
      .withColumn("cy", floor(col("py") / CellH).cast("long"))
    p.join(b, Seq("cx", "cy"))
      .where(col("px") >= col("lon0") && col("px") <= col("lon0") + lit(BoxW) &&
        col("py") >= col("lat0") && col("py") <= col("lat0") + lit(BoxH))
      .drop("cx", "cy")
  }
}
