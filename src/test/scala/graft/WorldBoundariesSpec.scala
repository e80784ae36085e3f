package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WorldBoundaries

/** Shape invariants for the deterministic boundary dim — the engine-side
  * analog of the reference's naturalearth frame (world_map_transformer
  * .py:161). Geometry here is data, so the spec pins the contract the
  * render path depends on: closed simple rings of real extent, keyed to
  * exactly the synthetic alpha3 codes the world dim emits. */
class WorldBoundariesSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("boundary dim: 25 TPC-H countries, every ring closed with >=6 distinct vertices in lon/lat domain") {
    val rows = WorldBoundaries.rows
    assert(rows.length == 25)
    assert(rows.map(_.iso_a3).distinct.length == 25)
    rows.foreach { r =>
      r.coordinates.foreach { poly =>
        assert(poly.length == 1, s"${r.iso_a3}: single-ring polygons (no holes at this fidelity)")
        val ring = poly.head
        assert(ring.head == ring.last, s"${r.iso_a3}: ring closed")
        assert(ring.dropRight(1).distinct.length >= 6,
          s"${r.iso_a3}: real outline, not a square (${ring.length} pts)")
        ring.foreach { p =>
          assert(p.length == 2 && p(0) >= -180 && p(0) <= 180 &&
            p(1) >= -90 && p(1) <= 90, s"${r.iso_a3}: lon/lat domain: $p")
        }
        // shoelace area: a degenerate (zero-area / collinear) ring would
        // render as a sliver — every island must enclose real area
        val area = 0.5 * math.abs(ring.sliding(2).map { w =>
          w(0)(0) * w(1)(1) - w(1)(0) * w(0)(1)
        }.sum)
        assert(area > 0.5, s"${r.iso_a3}: ring area $area deg^2 too small")
      }
    }
  }

  test("alias map covers the world dim's synthetic alpha3 codes exactly (uk row lands on GBR)") {
    val dimCodes = graft.operators.SteamOps.worldTable(s, sf)
      .select("alpha3").collect().map(_.getString(0)).toSet
    assert(WorldBoundaries.aliasForNation.keySet == dimCodes,
      "every rendered country has a real boundary — no placeholder fallback at this SF")
    assert(WorldBoundaries.aliasForNation("GB_A3") == "GBR")
    // region alignment: each synthetic code's region (nationkey % 5) must
    // match the aliased country's TPC-H region roster
    val regionOf = Map( // TPC-H nation list, region ids 0..4
      "DZA" -> 0, "ETH" -> 0, "KEN" -> 0, "MAR" -> 0, "MOZ" -> 0,
      "ARG" -> 1, "BRA" -> 1, "CAN" -> 1, "PER" -> 1, "USA" -> 1,
      "IND" -> 2, "IDN" -> 2, "JPN" -> 2, "CHN" -> 2, "VNM" -> 2,
      "FRA" -> 3, "DEU" -> 3, "ROU" -> 3, "RUS" -> 3, "GBR" -> 3,
      "EGY" -> 4, "IRN" -> 4, "IRQ" -> 4, "JOR" -> 4, "SAU" -> 4)
    WorldBoundaries.aliasForNation.foreach { case (synth, iso) =>
      val k = if (synth == "GB_A3") 23 else synth.stripPrefix("NATION_").stripSuffix("_A3").toInt
      assert(regionOf(iso) == k % 5, s"$synth -> $iso region mismatch")
    }
  }

  test("known-shape anchors: bbox centers near the real countries, island nations multi-ring") {
    val byIso = WorldBoundaries.rows.map(r => r.iso_a3 -> r.coordinates).toMap
    def center(iso: String): (Double, Double) = {
      val pts = byIso(iso).flatten.flatten
      ((pts.map(_(0)).min + pts.map(_(0)).max) / 2,
        (pts.map(_(1)).min + pts.map(_(1)).max) / 2)
    }
    def near(got: (Double, Double), want: (Double, Double), tol: Double) =
      math.abs(got._1 - want._1) <= tol && math.abs(got._2 - want._2) <= tol
    assert(near(center("FRA"), (2.0, 46.8), 4.0))
    assert(near(center("BRA"), (-54.0, -14.0), 7.0))
    assert(near(center("IND"), (82.0, 21.8), 6.0))
    assert(near(center("EGY"), (30.0, 26.8), 5.0))
    assert(near(center("USA"), (-96.0, 37.0), 8.0))
    assert(byIso("GBR").length == 2 && byIso("JPN").length == 4 &&
      byIso("IDN").length == 4, "island nations carry one polygon per island")
    // Russia is the widest country on the map; Japan is an arc in the NW Pacific
    val rus = byIso("RUS").flatten.flatten
    assert(rus.map(_(0)).max - rus.map(_(0)).min > 140)
    val jpn = byIso("JPN").flatten.flatten
    assert(jpn.forall(p => p(0) > 128 && p(0) < 147 && p(1) > 30 && p(1) < 46))
  }

  test("world_map_features: geometry panel matches the parsed boundary rows") {
    val rows = Jobs.worldMapFeatures(s, sf).collect()
    assert(rows.length == 25)
    val byA3 = rows.map(r => r.getAs[String]("alpha3") -> r).toMap
    val expected = WorldBoundaries.rows
      .map(r => r.alpha3 -> r.coordinates).toMap
    byA3.foreach { case (a3, r) =>
      val polys = expected(a3)
      assert(r.getAs[Long]("n_polygons") == polys.length.toLong, s"$a3 polygons")
      assert(r.getAs[Long]("n_vertices") ==
        polys.flatten.map(_.length).sum.toLong, s"$a3 vertices")
      val pts = polys.flatten.flatten
      assert(r.getAs[Double]("lon_min") == pts.map(_(0)).min, s"$a3 bbox")
      assert(r.getAs[Double]("lat_max") == pts.map(_(1)).max, s"$a3 bbox")
    }
    // the iso-miss country (nationkey 5, the deliberate lookup miss)
    // can never join stats; which OTHERS have facts depends on the SF
    assert(!byA3("NATION_5_A3").getAs[Boolean]("has_data"))
    assert(rows.exists(_.getAs[Boolean]("has_data")), "some country has stats")
  }

  test("dim DataFrame: broadcast-shaped MultiPolygon rows joinable on the synthetic key") {
    val d = WorldBoundaries.dim(s)
    assert(d.count() == 25)
    val row = d.filter(org.apache.spark.sql.functions.col("alpha3") === "GB_A3")
      .select("geometry.type").collect()
    assert(row.head.getString(0) == "MultiPolygon")
  }
}
