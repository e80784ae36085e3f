package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CoreOps, GraphOps, TextOps}

/** Round-6 operator semantics: incremental stats maintenance, span-level
  * duplication, fixed-point PageRank. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("incremental_stats: landed partials re-merge to the direct answer, new day folds in") {
    val ev = Tables.eventsUs(s, sf)
    val direct = CoreOps.incrementalStats(s, sf).collect().toSeq

    // land the daily partials, read back, merge — the incremental path
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_partials").toString
    CoreOps.statsPartials(ev).write.mode("overwrite").parquet(dir)
    val landed = CoreOps.mergeStatsPartials(s.read.parquet(dir)).collect().toSeq
    assert(landed == direct, "merge of landed partials != direct")

    // a new day folds in without touching history: split at a median day
    val withDay = ev.withColumn("day", expr("us div 86400000000"))
    val days = withDay.select("day").distinct().collect().map(_.getLong(0)).sorted
    assert(days.length > 1, "need multiple days to exercise the fold")
    val cut = days(days.length / 2)
    val hist = CoreOps.statsPartials(withDay.filter(col("day") < cut).drop("day"))
    val fresh = CoreOps.statsPartials(withDay.filter(col("day") >= cut).drop("day"))
    val folded = CoreOps.mergeStatsPartials(hist.unionByName(fresh)).collect().toSeq
    assert(folded == direct, "history + new-day partials != direct")
  }

  test("repeated_spans: full dups 1.0, stitched boilerplate partial, short docs zero") {
    import s.implicits._
    val boiler = "all rights reserved by the publisher"       // 6 words
    val docs = Seq(
      (1L, boiler),                                           // exact dup of 2
      (2L, boiler),
      (3L, "completely original sentence nobody else wrote"), // 6 unique words
      (4L, "too short"),                                      // < SpanK words
      (5L, s"unique page header then $boiler and unique page footer text")
    ).toDF("doc_id", "text")
    val out = TextOps.repeatedSpansDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    assert(out(1L) == ((2L, 2L, 1.0)), "exact dup: every span duplicated")
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0, "unique doc has no dup spans")
    assert(out(4L) == ((0L, 0L, 0.0)), "sub-SpanK doc: zero spans, zero frac")
    // doc 5 stitches the 6-word boilerplate into unique text: exactly the
    // two spans fully inside the boilerplate run are duplicated
    assert(out(5L)._1 == 11L && out(5L)._2 == 2L, s"stitched: got ${out(5L)}")
    assert(out(5L)._3 > 0.0 && out(5L)._3 < 1.0)
  }

  test("span_scrub: boilerplate excised exactly, unique prose survives in order") {
    import s.implicits._
    val boiler = "all rights reserved by the publisher"
    val docs = Seq(
      (1L, boiler), (2L, boiler),
      (3L, "completely original sentence nobody else wrote"),
      (4L, "too short"),
      (5L, s"unique page header then $boiler and unique page footer text")
    ).toDF("doc_id", "text")
    val out = TextOps.spanScrubDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(1L) == ((6L, 6L, "")), "fully duplicated doc scrubs to empty")
    assert(out(2L) == ((6L, 6L, "")))
    assert(out(3L)._2 == 0L && out(3L)._3 == "completely original sentence nobody else wrote")
    assert(out(4L) == ((2L, 0L, "too short")), "sub-SpanK doc untouched")
    assert(out(5L) == ((15L, 6L, "unique page header then and unique page footer text")),
      s"stitched boilerplate excised, prose intact in order: got ${out(5L)}")
  }

  test("graph_pagerank: fixed-point recurrence matches an independent replay; hubs outrank leaves") {
    import s.implicits._
    // star: hub 0 <-> leaves 1..4, plus an appendix path 4 <-> 5
    val raw = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (4L, 5L))
    val edges = raw.toDF("a", "b")
      .select(col("a").as("src"), col("b").as("dst"))
      .union(raw.toDF("a", "b").select(col("b").as("src"), col("a").as("dst")))
    // pr rides decimal(38,0) internally (hub-overflow safety at any node
    // count) — narrow at the edge exactly like graphPagerankFrames does
    val got = GraphOps.pagerankOnEdges(edges, GraphOps.PRIterations)
      .select(col("node"), col("pr").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent replay of the integer recurrence in plain Scala
    val adj = (raw ++ raw.map(_.swap)).groupMap(_._1)(_._2)
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var pr = adj.keys.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to GraphOps.PRIterations) {
      val contrib = pr.map { case (n, r) => n -> (85L * (r / deg(n))) / 100L }
      pr = adj.keys.map { n =>
        // toSeq before mapping to contributions: a Set would DEDUPE equal
        // contribution values from distinct in-neighbors
        val in = adj.collect { case (m, ds) if ds.contains(n) => m }.toSeq
        n -> (GraphOps.TeleportE12 + in.map(contrib).sum)
      }.toMap
    }
    assert(got == pr, s"engine ranks != replayed recurrence: $got vs $pr")
    assert(got(0L) > got(1L) && got(0L) > got(5L), "hub must outrank leaves")
    assert(got(4L) > got(1L), "bridge node outranks plain leaves")

    // mass conservation on the real co-purchase graph: integer truncation
    // may only shave ppm-level mass off nodes x 1e12
    val full = GraphOps.graphPagerank(s, sf)
    val n = full.count()
    val total = full.agg(sum(col("rank_e12").cast("decimal(38,0)")))
      .head.getDecimal(0).longValueExact()
    val seed = n * 1000000000000L
    assert(total <= seed && total > (seed * 0.999).toLong,
      s"mass drifted: $total of $seed over $n nodes")
  }
}
