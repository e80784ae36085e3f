package graft

import org.scalatest.funsuite.AnyFunSuite

class JobsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("two-job handoff: world map reads only the latest price drop") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_jobs").toString
    // older drop with poisoned values: if the latest-drop selection ever
    // reads it, the world averages blow up past any real price
    val poisoned = graft.operators.SteamOps.pricesFact(s, sf, withBad = true)
      .select("l_orderkey", "l_linenumber", "cc", "n_name", "usd_price")
      .withColumn("usd_price", lit(999999.0))
    graft.operators.SteamOps.writeDateStamped(poisoned, s"$base/steam_prices", "2024-01-01")
    val p2 = Jobs.runSteamPricesJob(s, sf, base, "2024-01-02")
    assert(p2.endsWith("dt=2024-01-02"))
    val rows = Jobs.runWorldMapJob(s, sf, base).collect()
    assert(rows.length == 25, "world table must keep every geo row")
    rows.foreach { r =>
      Option(r.getAs[Any]("avg_usd")).foreach(v =>
        assert(v.asInstanceOf[Double] < 500000.0,
          "poisoned older drop leaked into the world table"))
    }
    // EU propagation holds end-to-end through the landed data
    val eu = rows.filter(_.getAs[String]("continent") == "EUROPE")
      .map(_.getAs[Any]("usd_dif")).distinct
    assert(eu.length == 1)
  }
}
