package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first entry point: register every source table as a temp view so a
  * user can drive the whole engine from `spark.sql` — the migration
  * surface for anyone replacing the reference's pandas scripts with SQL.
  * Combine with [[GraftExtensions]] for the native functions and the
  * range-join rewrite in the same session.
  *
  * {{{
  *   graft.Sql.registerViews(spark, "/data/sf1")
  *   spark.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
  * }}}
  */
object Sql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables under their canonical names. `events` is
    * registered with `ts` normalized to a microsecond TimestampType
    * (whatever the physical parquet shape — [[Tables.eventsMicros]]);
    * the raw un-normalized scan stays visible as `events_raw`.
    * `events_ns` keeps its nanos-file-era PROMISE — `ts` as epoch-nanos
    * BIGINT — by deriving from the normalized view (`us × 1000`), so ad
    * hoc SQL written against the old physical shape keeps reading
    * correct values whatever is on disk today. */
  def registerViews(s: SparkSession, sfDir: String): Unit = {
    TableNames.filterNot(_ == "events").foreach { n =>
      Tables.table(s, sfDir, n).createOrReplaceTempView(n)
    }
    Tables.events(s, sfDir).createOrReplaceTempView("events_raw")
    Tables.eventsUs(s, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("us * 1000"))
      .drop("us")
      .createOrReplaceTempView("events_ns")
    Tables.eventsMicros(s, sfDir).createOrReplaceTempView("events")
  }

  /** Convenience: register views, then run one statement. */
  def run(s: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerViews(s, sfDir)
    s.sql(sql)
  }
}
