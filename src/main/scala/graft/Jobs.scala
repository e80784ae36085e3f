package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SteamOps

/** Job-level orchestration — the reference's application surface
  * (reference: run.py:16–63 wires SteamPricesETL then WorldMapETL; the
  * second job reads the first job's latest parquet drop).
  *
  * Spark-first shape: each job is a pure DataFrame transform plus one
  * sink write; the handoff between jobs is the date-stamped parquet key,
  * exactly as the reference hands off through its bucket.
  */
object Jobs {

  /** SteamPricesETL: build the (order, line, country, currency, usd) price
    * facts and land them under a date-stamped snappy-parquet key
    * (reference: run.py:46–55, steam_prices_transformer.py:193–210).
    * Returns the written path. */
  def runSteamPricesJob(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    val facts = SteamOps.pricesFact(s, sfDir, withBad = true)
      .select("l_orderkey", "l_linenumber", "cc", "n_name", "usd_price")
    SteamOps.writeDateStamped(facts, s"$outDir/steam_prices", date)
  }

  /** WorldMapETL: pick the latest date partition of the prices drop,
    * aggregate to the enriched world table (country averages, world
    * deviation, iso/geo joins, EU propagation)
    * (reference: run.py:57–63, world_map_transformer.py:275–300).
    *
    * The latest-drop selection is partition-pruned: `dt` is a partition
    * column, so only the newest directory is scanned. */
  def runWorldMapJob(s: SparkSession, sfDir: String, pricesBase: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val drops = s.read.parquet(s"$pricesBase/steam_prices")
    val latest = drops.agg(max(col("dt")).as("latest_dt"))
    val lastDrop = drops.join(broadcast(latest), col("dt") === col("latest_dt"))
    // country stats over the landed facts (same single-pass math as
    // SteamOps.worldDev: world average from exact partials via an
    // unpartitioned window over the bounded aggregated frame)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val perCountry = lastDrop.groupBy("cc").agg(
      sum(floor(col("usd_price") * lit(1000000.0) + lit(0.5))).as("s6"),
      count(col("usd_price")).as("cnt"))
    val dev = perCountry
      .withColumn("avg_usd", col("s6").cast("double") / lit(1000000.0) / col("cnt"))
      .withColumn("world_avg",
        sum(col("s6")).over(w).cast("double") / lit(1000000.0) / sum(col("cnt")).over(w))
      .withColumn("perc_dif", col("avg_usd") / col("world_avg") - lit(1.0))
      .withColumn("usd_dif",
        (col("avg_usd") / col("world_avg") - lit(1.0)) * col("world_avg"))
      .withColumn("alpha2", SteamOps.normalizeCode(col("cc")))
    val enriched = dev
      .join(broadcast(SteamOps.isoDim(s, sfDir)), dev("alpha2") === col("iso_a2"), "left")
      .select(col("iso_a3").as("s_alpha3"), col("avg_usd"), col("perc_dif"), col("usd_dif"))
    val world2 = SteamOps.geoDim(s, sfDir)
      .join(enriched, col("g_alpha3") === col("s_alpha3"), "left")
    import org.apache.spark.sql.expressions.Window
    val isEu = col("continent") === "EUROPE"
    world2
      .withColumn("usd_dif",
        when(isEu, max(col("usd_dif")).over(Window.partitionBy(isEu)))
          .otherwise(col("usd_dif")))
      .select(col("g_alpha2").as("alpha2"), col("g_alpha3").as("alpha3"),
        col("continent"), col("avg_usd"), col("perc_dif"), col("usd_dif"))
      .orderBy("alpha2")
  }
}
