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
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
