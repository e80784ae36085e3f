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
  /** Raw events scan. The driver has shipped `ts` in two physical shapes
    * over time — parquet TIMESTAMP(NANOS) (read as epoch-nanos LongType
    * under `spark.sql.legacy.parquet.nanosAsLong=true`) and, since the
    * 2026-08 regeneration, TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read as TIMESTAMP_NTZ). Operators must NOT consume this directly:
    * go through [[eventsMicros]]/[[eventsUs]], which normalize either
    * shape to one contract. */
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")

  /** events with `ts` normalized to a microsecond TimestampType column,
    * whatever the physical parquet type of the source:
    *  - LongType (legacy nanos-as-long): `timestamp_micros(ts div 1000)`
    *    — same ns→µs truncation DuckDB applies, keeping the oracle exact;
    *  - TIMESTAMP_NTZ (current TIMESTAMP_MICROS files): cast to
    *    TimestampType — a pure reinterpretation under the UTC session
    *    timezone every graft entry point sets;
    *  - TimestampType: already canonical.
    * This is the ONLY events entry operators should use (directly or via
    * [[eventsUs]]); `ts div 1000` must never appear in an operator. */
  def eventsMicros(s: SparkSession, d: String): DataFrame =
    normalizeTs(events(s, d))

  /** The [[eventsMicros]] normalization on ANY events-shaped frame —
    * factored out so streaming `readStream` sources (whose schema is
    * pinned up front) share the exact batch semantics. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — adapt Tables.normalizeTs")
    }
  }

  /** [[eventsMicros]] plus a `us: Long` epoch-microseconds column — the
    * integer time axis the temporal/session/window operators key on
    * (range windows, as-of joins, gap math all want a plain Long). */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsMicros(s, d).withColumn("us", unix_micros(col("ts")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
