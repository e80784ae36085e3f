package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer: loaders for the driver-generated parquet tables.
  *
  * Stands in for the reference's extract layer
  * (reference: Scripts/common/external_resources.py:10–175 — S3 bucket,
  * Steam API, exchange-rates API). Here every source is a parquet scan so
  * Catalyst gets predicate pushdown + column pruning for free; at cluster
  * scale these would be partitioned table paths, and the same code holds.
  */
object Tables {
  /** Fact-side tables worth spreading across cores after the scan, with
    * the unique key to hash-partition on (hash repartition avoids the
    * single-threaded sort-before-repartition that round-robin pays). */
  private val factKeys = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "customer" -> "c_custkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The driver's test parquet is one file with ONE row group per table,
    // so a scan cannot split — every downstream expression would run on a
    // single core. `graft.scan.repartition=N` (set by Bench/Verify) adds a
    // cheap hash shuffle after the scan to restore parallelism.
    // At cluster scale data arrives as many files/row groups and this stays
    // off — predicates and pruning still push through the Repartition node.
    val n = spark.conf.getOption("graft.scan.repartition").map(_.toInt).getOrElse(0)
    factKeys.get(name) match {
      case Some(key) if n > 0 =>
        df.repartition(n, org.apache.spark.sql.functions.col(key))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) — read as epoch-nanos LongType
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set by every graft
    * session entry point; Spark has no nanosecond timestamp type). */
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")

  /** events with `ts` converted to a microsecond TimestampType column
    * (`ns div 1000` — matches DuckDB's ns→us truncation for the oracle). */
  def eventsMicros(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
