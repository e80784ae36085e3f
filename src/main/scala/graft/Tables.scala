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
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
