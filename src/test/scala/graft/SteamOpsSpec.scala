package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PriceFunctions
import graft.operators.SteamOps

class SteamOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("price parse: locale semantics match the reference heuristic") {
    import s.implicits._
    // (price_str, rate) -> expected usd (reference semantics incl. the
    // one-separator regex and the [0.1,100] re-parse)
    val cases = Seq(
      ("12,34", 1.0, Some(12.34)),    // comma decimal
      ("12.34", 1.0, Some(12.34)),    // dot decimal in range -> stripped "1234" fails range -> re-parse keeps 12.34
      ("$ 19.99", 1.0, Some(19.99)),  // currency prefix
      // one-separator regex: match stops at the ',' -> "1 234" -> 1234/25 in range
      ("1 234,56", 25.0, Some(49.36)),
      // two separators: regex keeps "1.234"; dot-strip 1234 out of range -> re-parse 1.234
      ("1.234,56", 1.0, Some(1.234)),
      ("N/A", 1.0, None),              // unparseable -> null
      ("", 1.0, None))
    val df = cases.map { case (p, r, _) => (p, r) }.toDF("price_str", "rate")
      .withColumn("usd", PriceFunctions.parsePriceToUsd(col("price_str"), col("rate")))
    val got = df.select("usd").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    cases.zip(got).foreach { case ((p, r, want), g) =>
      assert(g.map(v => math.abs(v - want.getOrElse(0.0)) < 1e-9).getOrElse(want.isEmpty),
        s"parse('$p', rate=$r) = $g, want $want")
    }
  }

  test("pipeline: one row per nation, EU rows share one usd_dif") {
    val out = SteamOps.steamPipeline(s, sf).collect()
    assert(out.length == 25)
    val eu = out.filter(_.getAs[String]("continent") == "EUROPE")
      .map(_.getAs[Any]("usd_dif")).distinct
    assert(eu.length == 1, s"EU usd_dif not propagated: ${eu.mkString(",")}")
  }

  test("null_handling: bad rows are null and counted") {
    val rows = SteamOps.nullHandling(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") == r.getAs[Long]("n_parsed") + r.getAs[Long]("n_null"))
    }
    assert(rows.map(_.getAs[Long]("n_null")).sum > 0, "withBad injected no nulls")
  }

  test("iso_join: missing code surfaces as null alpha3") {
    val rows = SteamOps.isoJoin(s, sf).collect()
    assert(rows.exists(_.isNullAt(1)), "expected one alpha3 miss")
  }

  test("geo_enrich_join keeps all dim rows") {
    assert(SteamOps.geoEnrichJoin(s, sf).count() == 25)
  }

  test("latest_partition returns only the max date") {
    val d = SteamOps.latestPartition(s, sf).select("event_date").distinct().count()
    assert(d == 1)
  }

  test("parquet sink: snappy + date-stamped path roundtrip") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink_spec").toString
    val path = SteamOps.writeDateStamped(SteamOps.countryAvg(s, sf), base, "2024-02-03")
    assert(path.endsWith("dt=2024-02-03"))
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".snappy.parquet")), files.mkString(","))
    assert(s.read.parquet(path).count() == SteamOps.countryAvg(s, sf).count())
  }

  test("broadcast join: rates dim join plans as BroadcastHashJoin") {
    val plan = SteamOps.priceParse(s, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
