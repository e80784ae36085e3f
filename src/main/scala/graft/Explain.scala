package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the named queries (or all)
  * so plan quality (pushdown, broadcast, partial agg, codegen spans) can
  * be reviewed. `runMain graft.Explain [sfDir] [name,name,...]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = args.lift(2).contains("exec")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.forall(_.contains(name))) {
        println(s"\n========== $name ==========")
        try {
          val df = fn(spark, sfDir)
          if (exec) {
            // drive THIS plan object (df.write would clone it), then print
            // the final adaptive plan — shows ReusedExchange / runtime
            // join changes
            val qe = df.queryExecution
            qe.executedPlan.execute().foreach(_ => ())
            println(qe.executedPlan.toString)
          } else df.explain("formatted")
        } catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
