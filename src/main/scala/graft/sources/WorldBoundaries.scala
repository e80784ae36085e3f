package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Country-boundary dimension for the choropleth render path.
  *
  * The reference renders its world map off the geopandas/naturalearth
  * boundary frame (reference: world_map_transformer.py:161
  * `gpd.read_file(gpd.datasets.get_path('naturalearth_lowres'))` — a
  * polygon table keyed by ISO alpha-3). This is the engine-side analog:
  * a deterministic, dependency-free alpha3 → boundary-rings table shipped
  * as code (no network, byte-identical across runs), feeding the
  * ring-generic SVG/GeoJSON builders in [[graft.Jobs]].
  *
  * Fidelity contract: outlines are compact hand-simplified approximations
  * (8–50 vertices per ring, a few rings for island nations) of the real
  * land masses — recognizable at world-map zoom, NOT survey-grade. That is
  * exactly the naturalearth_lowres trade-off the reference makes: a small
  * boundary dim (≤ a few hundred rows, always broadcast) joined to the
  * stats frame on alpha3.
  *
  * Key mapping: the driver's synthetic nation dim yields alpha3 codes of
  * the form `NATION_<k>_A3` (plus `GB_A3` via the reference's uk→gb
  * normalization, world_map_transformer.py:127–128). Each synthetic code
  * is deterministically aliased to the real country occupying the same
  * slot in the TPC-H nation roster for its region (regionkey = k % 5,
  * region ids match TPC-H: AFRICA/AMERICA/ASIA/EUROPE/MIDDLE EAST), so
  * nationkey 23 (the uk row) lands on GBR and the rendered map is the
  * actual TPC-H world. Geometry schema is GeoJSON MultiPolygon:
  * coordinates = polygons → rings → points → [lon, lat].
  *
  * Scale shape: a world boundary dim is bounded by the planet (~250
  * countries × ~dozens of vertices at this fidelity) — it is ALWAYS the
  * broadcast side of the render join; the stats side stays distributed.
  */
object WorldBoundaries {

  /** `iso|synthetic|ring;ring…` — ring = space-separated `lon,lat` pairs.
    * Rings are auto-closed by the parser (first point re-appended). */
  // format: off
  private val data: Seq[String] = Seq(
    // AFRICA (region 0): ALGERIA, ETHIOPIA, KENYA, MOROCCO, MOZAMBIQUE
    "DZA|NATION_0_A3|-2.2,35.1 1.8,36.6 6.3,37.1 8.6,36.9 8.2,34.7 9.5,30.3 9.9,25.4 6.0,19.5 3.2,19.1 -4.8,25.0 -8.7,27.3 -8.7,28.8 -7.1,29.6 -4.8,30.5 -2.2,32.1 -1.8,34.5",
    "ETH|NATION_5_A3|36.5,14.3 39.0,14.5 40.0,14.0 42.4,12.5 43.3,11.0 46.0,8.0 47.8,8.0 45.0,5.0 41.9,3.9 39.5,3.4 36.0,4.4 34.5,6.5 33.0,8.3 34.3,10.6",
    "KEN|NATION_10_A3|33.9,-1.0 34.0,1.2 34.5,3.5 35.9,4.6 38.0,3.6 41.0,4.0 41.9,3.9 41.0,-0.9 40.2,-2.6 39.2,-4.7 37.7,-3.0",
    "MAR|NATION_15_A3|-5.9,35.8 -2.2,35.1 -1.8,34.5 -2.2,32.1 -4.8,30.5 -7.1,29.6 -8.7,28.8 -11.5,28.2 -9.6,30.4 -9.8,31.4 -9.2,32.6 -8.5,33.3 -6.9,34.0",
    "MOZ|NATION_20_A3|40.5,-10.5 40.4,-12.8 40.6,-14.2 39.0,-16.5 36.9,-17.9 35.3,-19.1 34.9,-20.5 35.5,-22.1 35.4,-24.5 32.9,-25.9 32.1,-26.8 32.0,-25.0 31.3,-22.4 32.5,-20.6 33.0,-19.0 30.4,-16.0 33.2,-14.0 36.5,-11.7 37.9,-11.3",
    // AMERICA (region 1): ARGENTINA, BRAZIL, CANADA, PERU, UNITED STATES
    "ARG|NATION_1_A3|-68.6,-22.0 -67.3,-24.0 -68.3,-26.9 -69.7,-28.4 -70.0,-30.1 -69.8,-33.3 -70.4,-36.0 -71.7,-39.6 -70.8,-43.0 -71.2,-44.8 -71.7,-48.0 -72.3,-50.6 -71.9,-52.0 -68.4,-52.3 -65.1,-50.0 -67.6,-46.0 -65.5,-45.0 -63.8,-42.1 -65.1,-40.8 -62.3,-38.8 -56.7,-36.9 -58.4,-33.0 -58.2,-30.0 -55.7,-27.5 -53.6,-26.9 -54.6,-25.6 -57.6,-25.6 -58.6,-24.8 -62.7,-22.2",
    "BRA|NATION_6_A3|-69.9,-4.2 -69.8,0.6 -67.1,1.7 -63.4,2.4 -60.0,5.0 -56.5,1.9 -51.7,4.0 -50.0,1.8 -48.5,-0.2 -44.9,-1.5 -41.8,-2.9 -38.5,-3.7 -34.8,-7.0 -37.0,-11.0 -39.0,-13.0 -39.0,-17.0 -40.9,-21.9 -43.2,-22.9 -47.0,-24.0 -48.6,-28.5 -52.1,-32.2 -53.4,-33.7 -55.6,-30.9 -57.6,-30.2 -55.7,-27.5 -54.6,-25.6 -54.3,-24.0 -55.8,-22.3 -58.0,-20.2 -58.2,-16.3 -60.2,-15.1 -60.5,-13.8 -65.3,-11.5 -65.4,-9.7 -70.5,-9.4 -73.8,-7.3",
    "CAN|NATION_11_A3|-141.0,69.5 -128.0,70.0 -115.0,68.5 -107.0,68.0 -92.0,68.5 -85.0,66.5 -88.0,63.0 -94.0,59.0 -92.0,57.0 -85.0,55.3 -82.3,52.9 -79.5,51.3 -78.5,55.0 -76.5,58.0 -77.5,62.0 -70.0,61.0 -64.5,60.3 -61.0,56.0 -57.0,53.5 -55.8,52.0 -60.0,50.0 -66.0,49.0 -63.0,45.5 -66.5,45.0 -67.8,47.1 -71.0,45.3 -75.0,45.0 -79.0,43.3 -82.5,42.0 -83.5,46.0 -89.0,48.0 -95.2,49.0 -123.0,49.0 -124.8,49.5 -127.0,52.0 -130.0,55.0 -133.0,58.0 -137.0,59.0 -141.0,60.3",
    "PER|NATION_16_A3|-80.4,-3.4 -77.8,-3.0 -75.2,-0.5 -73.0,-2.2 -70.0,-4.2 -73.8,-7.3 -70.5,-9.4 -69.4,-12.5 -68.8,-14.2 -69.0,-16.2 -69.6,-17.6 -70.4,-18.3 -71.5,-17.3 -75.1,-15.4 -77.0,-12.1 -79.0,-8.0 -81.3,-6.1 -81.2,-4.7",
    "USA|NATION_21_A3|-124.7,48.4 -123.0,49.0 -95.2,49.0 -89.0,48.0 -83.5,46.0 -82.5,42.0 -79.0,43.3 -76.8,43.6 -75.0,45.0 -71.0,45.3 -67.8,47.1 -67.0,44.8 -70.0,43.0 -71.0,41.5 -74.0,40.5 -75.5,35.2 -80.5,32.0 -80.0,26.8 -80.0,25.2 -81.8,24.6 -82.7,27.9 -84.0,30.1 -89.0,29.2 -94.0,29.7 -97.2,26.0 -99.2,26.5 -101.4,29.8 -104.5,29.6 -106.5,31.8 -111.0,31.3 -114.8,32.5 -117.1,32.5 -120.6,34.6 -122.4,37.8 -124.2,40.3 -124.0,44.5",
    // ASIA (region 2): INDIA, INDONESIA, JAPAN, CHINA, VIETNAM
    "IND|NATION_2_A3|68.2,23.7 70.5,20.7 72.8,19.0 74.9,12.9 77.5,8.1 80.3,13.0 84.0,19.0 88.0,21.6 89.0,22.0 88.4,26.5 92.0,25.0 95.0,27.0 97.0,28.2 94.0,29.3 88.8,27.9 84.0,29.3 80.0,30.2 78.0,32.5 76.0,34.6 74.0,35.5 72.5,32.8 70.9,30.4 71.1,27.9 69.6,26.7",
    "IDN|NATION_7_A3|95.3,5.6 98.0,4.0 100.1,2.0 102.3,0.0 104.4,-2.0 105.9,-5.9 104.0,-5.7 101.5,-3.2 98.8,-0.5 96.0,3.0;105.1,-6.8 108.0,-6.8 111.0,-6.5 114.4,-7.8 114.6,-8.7 111.0,-8.3 107.5,-7.7;109.0,0.0 110.5,1.8 113.5,3.0 117.0,3.5 118.5,0.9 117.5,-2.5 116.0,-4.0 113.0,-3.4 110.2,-2.9 108.9,-1.0;131.0,-1.0 134.0,-1.8 137.0,-1.6 141.0,-2.6 141.0,-9.1 138.0,-8.2 135.0,-4.8 132.3,-3.0",
    "JPN|NATION_12_A3|140.9,41.5 141.9,39.5 140.9,38.0 140.6,36.2 139.8,34.9 138.0,34.6 135.8,33.4 132.0,34.0 130.9,34.4 132.5,35.5 136.0,36.2 137.3,37.5 139.5,38.5 140.0,40.5;140.3,42.3 141.5,42.6 143.0,42.0 145.8,43.4 144.0,44.1 141.7,45.4 140.5,43.3;130.2,33.6 131.0,33.6 131.9,32.8 131.3,31.4 130.6,31.0 130.2,32.0;132.8,34.1 133.6,34.2 134.6,34.3 134.7,33.5 133.8,33.4 133.0,33.4",
    "CHN|NATION_17_A3|73.6,39.4 76.0,35.8 78.0,32.5 80.0,30.2 84.0,28.8 88.8,27.9 92.0,27.8 97.0,28.2 98.7,24.0 101.8,22.5 105.3,23.3 108.0,21.5 110.0,21.0 113.2,22.1 116.7,23.4 119.3,25.9 121.9,29.9 121.0,31.7 119.5,34.8 120.3,36.1 122.5,37.4 117.7,38.9 121.0,40.0 124.3,40.0 128.0,41.4 130.6,42.4 131.2,45.0 134.0,48.3 126.5,51.7 121.5,53.3 115.0,49.5 111.5,43.7 105.0,41.8 97.0,42.7 90.0,45.0 87.3,49.1 82.0,45.5 80.2,42.2 76.0,40.4",
    "VNM|NATION_22_A3|102.2,22.4 105.3,23.3 106.7,22.8 108.0,21.5 106.7,20.3 105.8,19.5 106.6,18.3 107.8,16.6 108.9,15.4 109.3,13.8 109.2,11.6 108.0,10.7 106.7,10.3 104.8,8.6 104.4,10.4 105.6,11.7 107.3,12.3 107.4,14.6 106.5,15.5 105.2,17.7 103.9,19.3 102.7,21.7",
    // EUROPE (region 3): FRANCE, GERMANY, ROMANIA, RUSSIA, UNITED KINGDOM
    "FRA|NATION_3_A3|2.5,51.1 -1.6,49.6 -1.9,48.6 -4.8,48.4 -4.3,47.8 -2.0,47.0 -1.1,46.3 -1.2,44.6 -1.8,43.4 0.7,42.7 3.0,42.4 4.8,43.3 6.5,43.1 7.5,43.7 7.7,45.0 6.8,45.9 6.1,46.3 7.6,47.6 8.2,49.0 6.4,49.5 4.9,49.8",
    "DEU|NATION_8_A3|8.6,54.9 9.5,54.8 10.9,54.0 13.0,54.4 14.2,53.9 14.6,52.0 15.0,51.0 12.1,50.3 13.8,48.7 12.9,47.5 10.2,47.3 7.6,47.6 8.2,49.0 6.4,49.5 6.1,50.7 5.9,51.8 7.2,53.3",
    "ROU|NATION_13_A3|22.9,48.0 26.6,48.3 28.2,46.8 28.2,45.4 29.7,45.2 28.6,43.8 25.0,43.7 22.7,44.2 21.4,44.8 20.3,46.1",
    "RUS|NATION_18_A3|28.0,59.8 31.5,62.9 30.0,64.5 29.5,66.5 29.0,69.0 33.0,69.5 41.0,67.0 44.0,67.0 54.0,68.9 60.0,69.0 68.0,69.2 73.0,68.0 80.0,72.0 95.0,76.0 104.0,77.7 113.0,74.0 130.0,73.0 140.0,72.0 150.0,70.0 160.0,69.8 170.0,68.8 179.5,66.0 178.5,62.5 174.0,61.5 163.0,60.0 162.5,56.5 156.7,50.9 155.5,57.0 150.0,59.5 143.0,59.4 135.3,54.7 141.3,53.3 140.2,48.5 137.7,45.9 131.9,43.1 130.6,42.4 135.1,48.5 126.5,51.7 121.5,53.3 116.0,50.0 98.0,50.5 90.0,50.0 87.3,49.1 85.0,50.5 77.0,53.5 70.0,55.2 61.0,51.0 51.0,51.5 47.0,48.2 48.0,45.6 47.5,43.0 44.0,42.6 40.0,43.5 38.0,44.3 39.0,47.2 38.5,49.8 35.0,52.0 32.0,54.0 30.5,55.8 27.8,57.3",
    "GBR|GB_A3|-5.7,50.1 -3.0,50.7 -1.0,50.8 1.4,51.2 1.7,52.6 0.2,53.5 -0.2,54.2 -1.3,54.9 -2.0,55.8 -2.5,56.5 -1.8,57.5 -3.1,58.6 -5.0,58.6 -5.8,57.0 -5.0,56.0 -4.8,55.0 -3.6,54.8 -3.0,54.1 -4.7,53.4 -4.1,52.5 -5.3,51.9 -4.0,51.2;-8.2,54.5 -7.3,54.1 -5.9,54.1 -5.5,54.7 -6.5,55.2 -7.8,55.0",
    // MIDDLE EAST (region 4): EGYPT, IRAN, IRAQ, JORDAN, SAUDI ARABIA
    "EGY|NATION_4_A3|25.0,31.6 30.5,31.4 32.3,31.3 34.2,31.3 34.9,29.4 34.0,27.8 33.3,28.6 32.6,29.9 32.5,29.5 33.0,28.0 34.5,25.5 35.8,23.9 36.9,22.0 25.0,22.0",
    "IRN|NATION_9_A3|44.8,39.7 48.0,38.9 48.9,37.4 54.0,36.9 56.0,38.1 59.0,37.6 61.0,36.6 60.9,33.5 60.9,29.8 61.8,28.2 61.6,25.2 57.3,25.7 54.0,26.5 51.5,27.8 49.5,29.9 48.0,30.0 47.4,32.4 45.5,33.5 45.4,35.0 44.8,37.0",
    "IRQ|NATION_14_A3|42.4,37.3 44.8,37.0 45.4,35.0 45.5,33.5 47.4,32.4 48.0,30.0 47.0,29.6 44.7,29.2 42.1,31.1 39.2,32.2 38.8,33.4 41.2,34.8 41.3,36.4",
    "JOR|NATION_19_A3|35.0,29.4 36.1,29.2 37.0,30.0 38.0,30.5 37.0,31.5 39.3,32.2 38.0,32.5 36.4,32.4 35.8,32.7 35.5,31.8 35.4,31.2 35.2,30.3",
    "SAU|NATION_24_A3|34.9,29.4 36.1,29.2 37.0,30.0 38.0,30.5 37.0,31.5 39.2,32.1 42.1,31.1 44.7,29.2 46.5,29.1 47.5,29.0 48.4,28.5 50.2,26.5 50.8,24.7 51.6,24.1 55.1,22.6 52.8,17.3 47.5,17.1 43.2,17.5 42.8,16.4 40.8,19.8 39.1,22.4 38.5,24.1 37.2,25.4 35.8,27.5")
  // format: on

  /** One parsed boundary row: ISO code, the synthetic dim code it backs,
    * and MultiPolygon coordinates (polygons → rings → points → [lon,lat]),
    * every ring closed. */
  final case class BoundaryRow(iso_a3: String, alpha3: String,
      coordinates: Seq[Seq[Seq[Seq[Double]]]])

  /** Parsed rows, rings auto-closed. Each ring becomes its own
    * single-ring polygon (island outlines, no holes at this fidelity). */
  lazy val rows: Seq[BoundaryRow] = data.map { line =>
    val Array(iso, synth, body) = line.split('|')
    val polys = body.split(';').toSeq.map { ringStr =>
      val pts = ringStr.trim.split(' ').toSeq.map { p =>
        val Array(lon, lat) = p.split(',')
        Seq(lon.toDouble, lat.toDouble)
      }
      Seq(if (pts.head == pts.last) pts else pts :+ pts.head)
    }
    BoundaryRow(iso, synth, polys)
  }

  /** Synthetic dim alpha3 → ISO alpha3 (25 entries, GB_A3 → GBR). */
  lazy val aliasForNation: Map[String, String] =
    rows.map(r => r.alpha3 -> r.iso_a3).toMap

  /** The boundary dim as a DataFrame: (alpha3, iso_a3, geometry) where
    * geometry is a GeoJSON-shaped MultiPolygon struct. Bounded by the
    * planet's country count — always broadcast it into the render join. */
  def dim(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.toDF()
      .select(col("alpha3"), col("iso_a3"),
        struct(lit("MultiPolygon").as("type"),
          col("coordinates").as("coordinates")).as("geometry"))
  }
}
