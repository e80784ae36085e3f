package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoreOps

/** Round-6 operator semantics: incremental stats maintenance. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("incremental_stats: landed partials re-merge to the direct answer, new day folds in") {
    val ev = Tables.events(s, sf)
    val direct = CoreOps.incrementalStats(s, sf).collect().toSeq

    // land the daily partials, read back, merge — the incremental path
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_partials").toString
    CoreOps.statsPartials(ev).write.mode("overwrite").parquet(dir)
    val landed = CoreOps.mergeStatsPartials(s.read.parquet(dir)).collect().toSeq
    assert(landed == direct, "merge of landed partials != direct")

    // a new day folds in without touching history: split at a median day
    val withDay = ev.withColumn("day", expr("ts div 86400000000000"))
    val days = withDay.select("day").distinct().collect().map(_.getLong(0)).sorted
    assert(days.length > 1, "need multiple days to exercise the fold")
    val cut = days(days.length / 2)
    val hist = CoreOps.statsPartials(withDay.filter(col("day") < cut).drop("day"))
    val fresh = CoreOps.statsPartials(withDay.filter(col("day") >= cut).drop("day"))
    val folded = CoreOps.mergeStatsPartials(hist.unionByName(fresh)).collect().toSeq
    assert(folded == direct, "history + new-day partials != direct")
  }
}
