package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PriceFunctions._

/** Reference-derived operators #1–12 (SURVEY.md §2), re-expressed
  * Spark-first over the driver's TPC-H-ish tables.
  *
  * Domain mapping (SURVEY.md §3): `nation` = the country/currency dim
  * (rates derived deterministically from `n_nationkey`, USD pinned to 1 as
  * the reference pins USD — steam_prices_transformer.py:95–96); `lineitem`
  * = the per-(app,country) price facts; `events` = the bucket timeline.
  *
  * Scale notes: every dim join is `broadcast()` (zero shuffle at any fact
  * scale); global scalars (world average) are single-row aggregates
  * broadcast-crossed — never collected to the driver; group-conditional
  * propagation is a window over a bounded partition key.
  */
object SteamOps {

  /** Currency/rates dim (reference: steam_prices_transformer.py:82–98).
    * 25 rows — always broadcast. `cc` is the raw ALPHA-2-style code the
    * reference receives in lowercase, with one 'uk' to exercise uk→gb. */
  def ratesDim(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_nationkey"),
      col("n_name"),
      rateFromNationKey(col("n_nationkey")).as("rate"),
      when(col("n_nationkey") === 23, lit("uk"))
        .otherwise(lower(col("n_name"))).as("cc"))

  /** The price fact stream: lineitem rows priced in a locale-formatted
    * string, joined (broadcast) to the rates dim, parsed to USD.
    * (reference: steam_prices_transformer.py:134–173 builds the same
    * (app, country, currency, usd_price) facts row by row over the API.)
    *
    * `withBad=true` injects unparseable price strings (reference rows whose
    * API payload had no digits) to exercise the NaN/null path. */
  def pricesFact(s: SparkSession, dir: String, withBad: Boolean = false): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val joined = li.join(broadcast(ratesDim(s, dir)),
      li("l_suppkey") % 25 === col("n_nationkey"))
    val ct = floor(col("l_extendedprice") * col("rate") / lit(1000.0) * lit(100.0) + lit(0.5))
    val fmt = col("l_orderkey") % 3
    val formatted = formatPriceString(col("ct"), col("fmt"))
    val priceStr =
      if (withBad) when(col("l_orderkey") % 17 === 0, lit("N/A")).otherwise(formatted)
      else formatted
    joined
      .withColumn("ct", ct)
      .withColumn("fmt", fmt)
      .withColumn("price_str", priceStr)
      .withColumn("usd_price", parsePriceToUsd(col("price_str"), col("rate")))
      .select("l_orderkey", "l_linenumber", "n_nationkey", "n_name", "cc",
        "rate", "ct", "price_str", "usd_price")
  }

  /** #1 price_parse — locale price string → USD float, null on failure. */
  def priceParse(s: SparkSession, dir: String): DataFrame =
    pricesFact(s, dir)
      .select("l_orderkey", "l_linenumber", "price_str", "usd_price")
      .orderBy("l_orderkey", "l_linenumber")

  /** #2 currency_convert — price ÷ rate via broadcast join to the rates dim
    * (reference: steam_prices_transformer.py:158–164). */
  def currencyConvert(s: SparkSession, dir: String): DataFrame =
    pricesFact(s, dir)
      .withColumn("local_price", col("ct").cast("double") / lit(100.0))
      .withColumn("usd_direct", col("local_price") / col("rate"))
      .select("l_orderkey", "l_linenumber", "n_name", "local_price", "usd_direct")
      .orderBy("l_orderkey", "l_linenumber")

  /** Exact (order-independent) per-country mean of usd_price: integer-sum
    * at 1e-6 precision, divided back at the edge. Null-aware: unparseable
    * rows don't count (reference NaN rows are excluded by pandas mean). */
  private def avgUsdE6: Column =
    sum(floor(col("usd_price") * lit(1000000.0) + lit(0.5))).cast("double") /
      lit(1000000.0) / count(col("usd_price"))

  /** #3 country_avg — per-country mean USD price
    * (reference: world_map_transformer.py:120–122). */
  def countryAvg(s: SparkSession, dir: String): DataFrame =
    pricesFact(s, dir).groupBy("cc").agg(avgUsdE6.as("avg_usd")).orderBy("cc")

  /** Country means + global mean in ONE pass over the fact: the global
    * average is re-derived from the per-country integer partials
    * (Σ sums / Σ counts — bit-identical to a global aggregate because the
    * partials are exact integers) via an unpartitioned window over the
    * ALREADY-AGGREGATED frame. That frame is one row per country —
    * bounded by the dimension, not the facts — so the single-partition
    * window is fine at any fact scale, and the fact pipeline runs exactly
    * once (a cross join against a separate global aggregate would be
    * re-aliased by the analyzer and recompute the whole fact scan).
    *
    * Public: any fact-shaped frame with (cc, usd_price) works — Jobs runs
    * this same math over the landed parquet drop. */
  /** Exact per-country partial aggregate `(cc, s6, cnt)` — integer-scaled
    * price sum and row count. This is the MERGEABLE representation:
    * partials of two drops summed per key equal the partials of their
    * union exactly (integer addition is associative), which is what makes
    * incremental landing possible (Jobs.mergeCountryPartials). */
  def countryPartials(fact: DataFrame): DataFrame =
    fact.groupBy("cc").agg(
      sum(floor(col("usd_price") * lit(1000000.0) + lit(0.5))).as("s6"),
      count(col("usd_price")).as("cnt"))

  /** Final per-country stats derived from a partials frame. */
  def devFromPartials(perCountry: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    perCountry
      .withColumn("avg_usd", col("s6").cast("double") / lit(1000000.0) / col("cnt"))
      .withColumn("world_avg",
        sum(col("s6")).over(w).cast("double") / lit(1000000.0) / sum(col("cnt")).over(w))
      .withColumn("perc_dif", col("avg_usd") / col("world_avg") - lit(1.0))
      .withColumn("usd_dif", (col("avg_usd") / col("world_avg") - lit(1.0)) * col("world_avg"))
      .drop("s6", "cnt", "world_avg")
  }

  def worldDev(fact: DataFrame): DataFrame =
    devFromPartials(countryPartials(fact))

  /** #4 world_avg_dev — percent + USD deviation from the world average
    * (reference: world_map_transformer.py:123–125). */
  def worldAvgDev(s: SparkSession, dir: String): DataFrame =
    worldDev(pricesFact(s, dir))
      .select("cc", "avg_usd", "perc_dif", "usd_dif")
      .orderBy("cc")

  /** Country-code canonicalization: uk→gb then uppercase
    * (reference: world_map_transformer.py:127–128). */
  def normalizeCode(c: Column): Column =
    upper(when(c === "uk", lit("gb")).otherwise(c))

  /** #5 code_normalize. */
  def codeNormalize(s: SparkSession, dir: String): DataFrame =
    ratesDim(s, dir)
      .select(col("n_nationkey"), col("cc").as("cc_raw"),
        normalizeCode(col("cc")).as("cc_norm"))
      .orderBy("n_nationkey")

  /** ALPHA-2 → ALPHA-3 lookup dim (reference loads a CSV lookup,
    * world_map_transformer.py:131–144; here derived from nation). One code
    * is deliberately absent to exercise the reference's miss→None path. */
  def isoDim(s: SparkSession, dir: String): DataFrame =
    ratesDim(s, dir)
      .filter(col("n_nationkey") =!= 5)
      .select(normalizeCode(col("cc")).as("iso_a2"),
        concat(normalizeCode(col("cc")), lit("_A3")).as("iso_a3"))

  /** #6 iso_join — broadcast lookup join replacing the reference's per-row
    * `.apply` + `loc` scan (world_map_transformer.py:142–143). */
  def isoJoin(s: SparkSession, dir: String): DataFrame = {
    val stats = worldDev(pricesFact(s, dir))
      .withColumn("alpha2", normalizeCode(col("cc")))
    stats.join(broadcast(isoDim(s, dir)), stats("alpha2") === col("iso_a2"), "left")
      .select(col("alpha2"), col("iso_a3").as("alpha3"), col("avg_usd"))
      .orderBy("alpha2")
  }

  /** World geo dimension: every country row, continent from region
    * (reference: world_map_transformer.py:146–184, geopandas world map). */
  def geoDim(s: SparkSession, dir: String): DataFrame = {
    val n = ratesDim(s, dir)
    val r = Tables.region(s, dir)
    Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n), Seq("n_nationkey"))
      .select(normalizeCode(col("cc")).as("g_alpha2"),
        concat(normalizeCode(col("cc")), lit("_A3")).as("g_alpha3"),
        col("r_name").as("continent"))
  }

  /** The merged world table: geo LEFT JOIN country stats on ALPHA-3,
    * keeping all geo rows (reference: world_map_transformer.py:205–208).
    * The country whose ALPHA-3 lookup missed surfaces as null stats. */
  def worldTable(s: SparkSession, dir: String, withBad: Boolean = false): DataFrame =
    worldTableFrom(worldDev(pricesFact(s, dir, withBad)), s, dir)

  /** iso + geo enrichment of any worldDev-shaped stats frame (shared by
    * the operator path and the job path over landed drops). */
  def worldTableFrom(dev: DataFrame, s: SparkSession, dir: String): DataFrame = {
    val stats = dev.withColumn("alpha2", normalizeCode(col("cc")))
    val enriched = stats
      .join(broadcast(isoDim(s, dir)), stats("alpha2") === col("iso_a2"), "left")
      .select(col("iso_a3").as("s_alpha3"), col("avg_usd"),
        col("perc_dif"), col("usd_dif"))
    geoDim(s, dir)
      .join(enriched, col("g_alpha3") === col("s_alpha3"), "left")
      .select(col("g_alpha2").as("alpha2"), col("g_alpha3").as("alpha3"),
        col("continent"), col("avg_usd"), col("perc_dif"), col("usd_dif"))
  }

  /** EU group-conditional propagation applied to a world table: usd_dif of
    * every EUROPE row becomes the EU max (window over the bounded group
    * key — reference: world_map_transformer.py:209–211). */
  def withEuPropagatedDif(world: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isEu = col("continent") === "EUROPE"
    world.withColumn("usd_dif",
      when(isEu, max(col("usd_dif")).over(Window.partitionBy(isEu)))
        .otherwise(col("usd_dif")))
  }

  /** #7 geo_enrich_join — left outer join keeping every dim row. */
  def geoEnrichJoin(s: SparkSession, dir: String): DataFrame =
    worldTable(s, dir)
      .select("alpha2", "continent", "avg_usd")
      .orderBy("alpha2")

  /** #8 eu_propagate — group-conditional max written back across the EU
    * group (reference: world_map_transformer.py:209–211) as a window over
    * the bounded group key, not a collect+mutate. */
  def euPropagate(s: SparkSession, dir: String): DataFrame =
    withEuPropagatedDif(worldTable(s, dir))
      .withColumnRenamed("usd_dif", "usd_dif_prop")
      .select("alpha2", "continent", "usd_dif_prop")
      .orderBy("alpha2")

  /** #9 latest_partition — rows of the newest date, the reference's
    * "latest object by LastModified" (external_resources.py:91–93) as a
    * broadcast single-row max, not a driver-side listing. */
  def latestPartition(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsMicros(s, dir)
    val maxd = ev.agg(max(to_date(col("ts"))).as("maxd"))
    ev.join(broadcast(maxd), to_date(col("ts")) === col("maxd"))
      // date-as-naive-timestamp: identical parquet logical type in Spark
      // and DuckDB (DATE physical repr varies across readers)
      .select(col("event_id"),
        to_date(col("ts")).cast("timestamp_ntz").as("event_date"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** #10 json_extract — JSON payload field extraction with presence checks
    * (reference: external_resources.py:126–137 digs
    * price_overview.final_formatted out of the API response). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    // ONE from_json with an explicit schema — a single JSON parse per row
    // (3× get_json_object = 3 parses; invisible on 9-byte test payloads,
    // material at real API-response sizes). PERMISSIVE mode surfaces an
    // unusable payload as nulls, never an ANSI runtime error; has_k =
    // "k present AND usable", matching the oracle's TRY_CAST semantics.
    val parsed = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, missing BIGINT"))
    Tables.events(s, dir)
      .select(col("event_id"), parsed.as("p"))
      .select(col("event_id"),
        col("p.k").as("k_val"),
        col("p.missing").as("missing_val"),
        col("p.k").isNotNull.as("has_k"))
      .orderBy("event_id")
  }

  /** #11 null_handling — unparseable rows → null + null-aware aggregation
    * (reference: steam_prices_transformer.py:130–132). */
  def nullHandling(s: SparkSession, dir: String): DataFrame =
    pricesFact(s, dir, withBad = true)
      .groupBy("cc")
      .agg(count(lit(1)).as("n_total"),
        count(col("usd_price")).as("n_parsed"),
        sum(when(col("usd_price").isNull, 1L).otherwise(0L)).as("n_null"),
        avgUsdE6.as("avg_usd"))
      .orderBy("cc")

  /** #12 steam_pipeline — the full reference dataflow end-to-end
    * (reference: run.py:46–63): parse → convert → country stats → world
    * deviation → normalize → iso join → geo left join → EU propagation. */
  def steamPipeline(s: SparkSession, dir: String): DataFrame =
    withEuPropagatedDif(worldTable(s, dir, withBad = true))
      .select("alpha2", "alpha3", "continent", "avg_usd", "perc_dif", "usd_dif")
      .orderBy("alpha2")

  /** Parquet sink: snappy parquet under a date-stamped key
    * (reference: external_resources.py:38–52 + the date-stamped
    * `trg_key_date_format` filename contract). */
  def writeDateStamped(df: DataFrame, baseDir: String, date: String): String = {
    val path = s"$baseDir/dt=$date"
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)
    path
  }

  /** Rows-only `parquet_sink` query: write the country stats through the
    * date-stamped snappy sink and read them back (round-trip proof). */
  def parquetSinkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // unique per-invocation base dir: a fixed path would race between
    // concurrent JVMs (overwrite-while-read)
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val path = writeDateStamped(countryAvg(s, dir), out, "2024-01-01")
    s.read.parquet(path).orderBy("cc")
  }
}
