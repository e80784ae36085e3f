package graft

import org.apache.spark.sql.SparkSession

/** ONE definition of the measurement-session shape, shared by the timing
  * harnesses ([[Bench]], [[TimeQ]]). The `nanosAsLong` and
  * `graft.scan.repartition` settings are load-bearing (events reads fail
  * / single-row-group parallelism collapses without them); harnesses
  * drifting apart would silently measure differently-configured engines. */
object Dev {
  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.repartition", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
