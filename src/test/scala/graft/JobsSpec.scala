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

  test("incremental partials: merging drops equals recomputing from scratch") {
    import org.apache.spark.sql.functions._
    val facts = graft.operators.SteamOps.pricesFact(s, sf)
      .select("l_orderkey", "cc", "usd_price")
    val drop1 = facts.filter(col("l_orderkey") % 2 === 0)
    val drop2 = facts.filter(col("l_orderkey") % 2 === 1)

    // pure merge == full recompute, exactly (integer partials)
    val inc = Jobs.mergeCountryPartials(
      Some(Jobs.mergeCountryPartials(None, drop1)), drop2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = graft.operators.SteamOps.countryPartials(facts)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == full)

    // disk round-trip: land drop1, then drop2; latest state == full
    val base = java.nio.file.Files.createTempDirectory("graft_inc").toString
    Jobs.landCountryPartials(s, s"$base/state", drop1, "2024-01-01")
    val p2 = Jobs.landCountryPartials(s, s"$base/state", drop2, "2024-01-02")
    val landed = s.read.parquet(p2)
      .collect().map(r => r.getAs[String]("cc") ->
        (r.getAs[Long]("s6"), r.getAs[Long]("cnt"))).toMap
    assert(landed == full)
    // derived stats off the merged state match the one-shot computation
    val viaState = graft.operators.SteamOps.devFromPartials(s.read.parquet(p2))
      .select("cc", "avg_usd").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = graft.operators.SteamOps.worldDev(facts)
      .select("cc", "avg_usd").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaState == oneShot)

    // retry safety: re-landing the same date merges from the SAME prior
    // (not from its own output) — no double count, same state
    val p2Retry = Jobs.landCountryPartials(s, s"$base/state", drop2, "2024-01-02")
    val retried = s.read.parquet(p2Retry)
      .collect().map(r => r.getAs[String]("cc") ->
        (r.getAs[Long]("s6"), r.getAs[Long]("cnt"))).toMap
    assert(retried == full, "retrying a landing must be idempotent")
  }

  test("price ingest job: usable rows landed, missing-price and corrupt rows quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest")
    val raw = dir.resolve("drop.jsonl")
    java.nio.file.Files.writeString(raw, Seq(
      // usable response (the reference's happy path)
      """{"app_id": 10, "cc": "us", "data": {"price_overview": {"final_formatted": "$9.99", "currency": "USD"}}}""",
      // price_overview present but no final_formatted (the reference's 2nd assert)
      """{"app_id": 20, "cc": "de", "data": {"price_overview": {"currency": "EUR"}}}""",
      // no price data at all (the reference's 1st assert)
      """{"app_id": 30, "cc": "fr", "data": {}}""",
      // malformed line — must quarantine, not fail the job
      """{"app_id": 40, "cc": "es", "data": {broken""").mkString("\n"))
    val (landed, retryQ, rejects) =
      Jobs.runPriceIngestJob(s, raw.toString, dir.toString, "2024-01-01")
    assert(landed.endsWith("dt=2024-01-01"))
    val ok = s.read.parquet(landed).collect()
    assert(ok.length == 1)
    assert(ok.head.getAs[String]("price_str") == "$9.99" &&
      ok.head.getAs[String]("currency") == "USD")
    // missing-price responses are FACTS (the app has no price), rejected
    // immediately with a reason; the truncated line is transport, queued
    // for retry with its raw text
    val bad = s.read.parquet(rejects).collect()
    assert(bad.length == 2, s"expected 2 permanent rejects, got ${bad.length}")
    assert(bad.forall(_.getAs[String]("reason") == "no_price"))
    assert(bad.forall(_.getAs[Int]("attempts_made") == 1))
    val rq = s.read.parquet(retryQ).collect()
    assert(rq.length == 1 && rq.head.getAs[String]("_corrupt_record") != null,
      "the malformed line must queue for retry carrying its raw text")
    assert(rq.head.getAs[Int]("attempt") == 1 &&
      rq.head.getAs[Long]("backoff_secs") == 3L)
  }

  test("price ingest retry policy: transient failure recovers on replay, then exhausts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry")
    val policy = Jobs.RetryPolicy(maxAttempts = 3, baseBackoffSecs = 3, factor = 3)
    // drop 1: the fetcher got rate-limited on app 50
    java.nio.file.Files.writeString(dir.resolve("d1.jsonl"),
      """{"app_id": 50, "cc": "it", "status": 429}""")
    val (l1, r1, j1) = Jobs.runPriceIngestJob(
      s, dir.resolve("d1.jsonl").toString, dir.toString, "2024-01-01", policy)
    assert(s.read.parquet(l1).isEmpty && s.read.parquet(j1).isEmpty)
    val q1 = s.read.parquet(r1).collect()
    assert(q1.length == 1 && q1.head.getAs[Int]("attempt") == 1 &&
      q1.head.getAs[Long]("backoff_secs") == 3L,
      "first transient failure: attempt 1, base backoff")

    // drop 2: the fetcher replayed the queue after the backoff and the
    // fetch SUCCEEDED — the row lands, nothing re-queues
    java.nio.file.Files.writeString(dir.resolve("d2.jsonl"),
      """{"app_id": 50, "cc": "it", "status": 200, "attempt": 1, """ +
        """"data": {"price_overview": {"final_formatted": "9,99€", "currency": "EUR"}}}""")
    val (l2, r2, j2) = Jobs.runPriceIngestJob(
      s, dir.resolve("d2.jsonl").toString, dir.toString, "2024-01-02", policy)
    val ok = s.read.parquet(l2).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("currency") == "EUR",
      "recovered row must land")
    assert(s.read.parquet(r2).isEmpty && s.read.parquet(j2).isEmpty)

    // drop 3: a persistently-failing app on its 2nd replay (attempt=2 →
    // third try) exhausts maxAttempts=3 and rejects permanently with the
    // attempt count; on its 1st replay it would re-queue at backoff 9 s
    java.nio.file.Files.writeString(dir.resolve("d3.jsonl"), Seq(
      """{"app_id": 60, "cc": "de", "status": 503, "attempt": 1}""",
      """{"app_id": 61, "cc": "fr", "status": 503, "attempt": 2}""").mkString("\n"))
    val (_, r3, j3) = Jobs.runPriceIngestJob(
      s, dir.resolve("d3.jsonl").toString, dir.toString, "2024-01-03", policy)
    val q3 = s.read.parquet(r3).collect()
    assert(q3.length == 1 && q3.head.getAs[Long]("app_id") == 60L &&
      q3.head.getAs[Int]("attempt") == 2 &&
      q3.head.getAs[Long]("backoff_secs") == 9L,
      "second attempt re-queues with exponential backoff")
    val dead = s.read.parquet(j3).collect()
    assert(dead.length == 1 && dead.head.getAs[Long]("app_id") == 61L &&
      dead.head.getAs[String]("reason") == "retries_exhausted" &&
      dead.head.getAs[Int]("attempts_made") == 3,
      "exhausted row records how hard the pipeline tried")
  }

  test("rates ingest job: one response object explodes to (currency, rate) rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rates")
    val raw = dir.resolve("rates.jsonl")
    java.nio.file.Files.writeString(raw,
      """{"base": "USD", "rates": {"EUR": 0.9, "GBP": 0.8, "JPY": 150.0}}""")
    val (path, retryQ) = Jobs.runRatesIngestJob(s, raw.toString, dir.toString, "2024-01-01")
    val rows = s.read.parquet(path).collect()
      .map(r => r.getAs[String]("currency") -> r.getAs[Double]("rate")).toMap
    assert(rows == Map("EUR" -> 0.9, "GBP" -> 0.8, "JPY" -> 150.0))
    assert(s.read.parquet(retryQ).isEmpty)
  }

  test("config-driven wiring: one yml drives the two-job pipeline; world-map data export lands") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val yml = dir.resolve("etl_config.yml")
    // same section/key structure as the reference's configs/etl_config.yml
    java.nio.file.Files.writeString(yml,
      s"""# graft pipeline config (reference: configs/etl_config.yml)
         |steam_prices_etl:
         |  source:
         |    sf_dir: "$sf"
         |    base_currency: "USD"
         |    ex_currencies: [ARS, TRY, RUB]
         |  target:
         |    base_dir: '$dir/out'
         |    run_date: "2024-01-05"
         |    trg_format: 'parquet'
         |""".stripMargin)
    val cfg = GraftConfig.load(yml.toString)
    assert(cfg("steam_prices_etl.source.base_currency") == "USD")
    assert(GraftConfig.list(cfg, "steam_prices_etl.source.ex_currencies") ==
      Seq("ARS", "TRY", "RUB"))
    val landed = Jobs.runFromConfig(s, yml.toString)
    assert(landed("steam_prices_etl.landed").endsWith("dt=2024-01-05"))
    assert(landed("world_map_etl.rows") == "25")
    // choropleth-ready export: CSV drop keyed by alpha3 with the measures
    val path = Jobs.exportWorldMapData(s, sf, s"$dir/out", "2024-01-05")
    val back = s.read.option("header", "true").csv(path)
    assert(back.count() == 25)
    assert(back.columns.contains("alpha3") && back.columns.contains("usd_dif"))
  }

  test("geojson export: valid FeatureCollection, one feature per country, zero-join render frame") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_geojson")
    val path = Jobs.exportWorldMapGeoJson(s, sf, dir.toString, "2024-01-05")
    // parse with Spark's own JSON reader — if this succeeds the artifact
    // is well-formed JSON a plotting layer can consume directly
    val back = s.read.option("multiLine", "true").json(path)
    val doc = back.collect()
    assert(doc.length == 1)
    assert(doc(0).getAs[String]("type") == "FeatureCollection")
    val feats = back.select(explode(col("features")).as("f")).select(
      col("f.type").as("ftype"),
      col("f.properties.alpha3").as("alpha3"),
      col("f.properties.usd_dif").as("usd_dif"),
      col("f.geometry.type").as("gtype"),
      col("f.geometry.coordinates").as("coords"))
    val rows = feats.collect()
    assert(rows.length == 25, "one feature per geo-dim country")
    assert(rows.forall(_.getAs[String]("ftype") == "Feature"))
    assert(rows.forall(_.getAs[String]("gtype") == "MultiPolygon"))
    val polysByA3 = rows.map { r =>
      r.getAs[String]("alpha3") ->
        r.getAs[collection.Seq[collection.Seq[collection.Seq[collection.Seq[Double]]]]]("coords")
    }.toMap
    polysByA3.foreach { case (a3, polys) =>
      assert(polys.nonEmpty, s"$a3 has geometry")
      polys.flatten.foreach { ring =>
        assert(ring.length >= 7 && ring.head == ring.last,
          s"$a3: real boundary ring (closed, >=6 distinct vertices), not a placeholder square — got ${ring.length} points")
        ring.foreach { p =>
          assert(p(0) >= -180 && p(0) <= 180 && p(1) >= -90 && p(1) <= 90,
            s"coords in GeoJSON lon/lat domain: $p")
        }
      }
    }
    // known-shape invariants: island nations are multi-ring, and the
    // boundary really is the aliased TPC-H country (bbox sanity)
    assert(polysByA3("GB_A3").length == 2, "GBR: Great Britain + Northern Ireland")
    assert(polysByA3("NATION_12_A3").length == 4, "JPN: four main islands")
    assert(polysByA3("NATION_7_A3").length == 4, "IDN: four major islands")
    def bbox(polys: collection.Seq[collection.Seq[collection.Seq[collection.Seq[Double]]]]) = {
      val pts = polys.flatten.flatten
      (pts.map(_(0)).min, pts.map(_(0)).max, pts.map(_(1)).min, pts.map(_(1)).max)
    }
    val (uLoMin, uLoMax, uLaMin, uLaMax) = bbox(polysByA3("NATION_21_A3"))
    assert(uLoMin < -120 && uLoMax > -70 && uLaMin > 20 && uLaMax < 55,
      "USA bbox spans the contiguous states")
    val (rLoMin, rLoMax, _, rLaMax) = bbox(polysByA3("NATION_18_A3"))
    assert(rLoMax - rLoMin > 140 && rLaMax > 70, "RUS spans Eurasia into the Arctic")
    // measures match the EU-propagated world table (zero-join contract:
    // what the renderer reads IS the pipeline output)
    val expected = graft.operators.SteamOps
      .withEuPropagatedDif(graft.operators.SteamOps.worldTable(s, sf))
      .select("alpha3", "usd_dif").collect()
      .map(r => r.getAs[String]("alpha3") ->
        Option(r.get(r.fieldIndex("usd_dif")))).toMap
    rows.foreach { r =>
      val got = Option(r.get(r.fieldIndex("usd_dif")))
      val want = expected(r.getAs[String]("alpha3"))
      (got, want) match {
        case (Some(g: Double), Some(w: Double)) => assert(math.abs(g - w) < 1e-9)
        case (g, w) => assert(g.isEmpty == w.isEmpty, s"null mismatch: $g vs $w")
      }
    }
  }

  test("svg render: one path per country, valid rings in viewport, palette fills, tooltips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_svg")
    val path = Jobs.renderWorldMapSvg(s, sf, dir.toString, "2024-01-05")
    val svg = s.read.text(path).collect().map(_.getString(0)).mkString("\n")
    assert(svg.startsWith("""<svg xmlns="http://www.w3.org/2000/svg""""))
    assert(svg.endsWith("</svg>"))
    val paths = """<path d="([^"]+)" fill="(#[0-9a-f]{6})"""".r
      .findAllMatchIn(svg).toSeq
    assert(paths.length == 25, "one path per geo-dim country")
    val pointRe = """(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)""".r
    paths.foreach { m =>
      val d = m.group(1)
      assert(d.startsWith("M") && d.endsWith("Z"), s"closed subpath: $d")
      // every M…Z subpath is a real boundary ring: closed, >=6 distinct
      // projected vertices (the old placeholder squares had exactly 5)
      d.split(" ").foreach { sub =>
        val pts = pointRe.findAllMatchIn(sub).map(p =>
          (p.group(1).toDouble, p.group(2).toDouble)).toSeq
        assert(pts.length >= 7, s"real outline, not a square: ${pts.length} pts")
        assert(pts.head == pts.last, "ring closes")
        pts.foreach { case (x, y) =>
          assert(x >= 0 && x <= 1000 && y >= 0 && y <= 500, s"in viewport: ($x,$y)")
        }
      }
    }
    // island nations render one subpath per island
    assert(paths.count(_.group(1).split(" ").length >= 2) >= 3,
      "GBR/JPN/IDN render multiple island subpaths")
    // every country's tooltip is present with its measures
    val expected = graft.operators.SteamOps
      .withEuPropagatedDif(graft.operators.SteamOps.worldTable(s, sf))
      .select("alpha3").collect().map(_.getString(0))
    expected.foreach(a3 => assert(svg.contains(s"<title>$a3: avg_usd="),
      s"tooltip for $a3"))
  }

  test("compaction: small-file partition rewritten to target count, rows identical") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val facts = graft.operators.SteamOps.pricesFact(s, sf)
      .select("l_orderkey", "l_linenumber", "cc", "usd_price")
      .repartition(16) // simulate 16 micro-batch appends
    graft.operators.SteamOps.writeDateStamped(facts, s"$base/drop", "2024-01-01")
    val dir = java.nio.file.Paths.get(s"$base/drop/dt=2024-01-01")
    def files = java.nio.file.Files.list(dir).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .count(_.endsWith(".parquet"))
    assert(files == 16)
    val before = s.read.parquet(dir.toString).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))).sorted
    val n = Jobs.compactPartition(s, s"$base/drop", "2024-01-01")
    assert(n == 1, s"tiny partition must compact to one file, got $n")
    assert(files == 1)
    val after = s.read.parquet(dir.toString).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))).sorted
    assert(after.toSeq == before.toSeq, "compaction must preserve every row")
  }

  test("date-partitioned layout: a dt filter prunes to one partition at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val facts = graft.operators.SteamOps.pricesFact(s, sf)
      .select("l_orderkey", "l_linenumber", "cc", "usd_price")
    for (d <- Seq("2024-01-01", "2024-01-02", "2024-01-03"))
      graft.operators.SteamOps.writeDateStamped(facts, s"$base/steam_prices", d)
    val pruned = s.read.parquet(s"$base/steam_prices")
      .filter(col("dt") === "2024-01-02")
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan")
    // the dt predicate must land in PartitionFilters (directory pruning),
    // NOT as a post-scan data filter over all three drops
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("dt")),
      s"dt filter missing from PartitionFilters: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of 3 dt partitions scanned, got ${scan.selectedPartitions.partitionCount}")
  }
}
