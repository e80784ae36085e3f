package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  test("streaming window agg (memory source → memory sink) matches batch twin") {
    import s.implicits._
    val input = MemoryStream[(Timestamp, String, Double)](s)
    val events = input.toDF().toDF("ts", "event_type", "value")

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val data = Seq(
      (t(0, 5), "click", 1.25), (t(0, 40), "click", 2.25), (t(0, 50), "view", 3.0),
      (t(1, 10), "click", 4.5), (t(2, 0), "view", 0.75))
    input.addData(data)

    val q = EventStreams.streamWindowAgg(events).writeStream
      .outputMode("complete").format("memory").queryName("graft_stream_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = s.table("graft_stream_out")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStreams.windowAgg(data.toDF("ts", "event_type", "value"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length == 4) // (0h click), (0h view), (1h click), (2h view)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      val h0click = streamed.find(r =>
        r.getAs[String]("event_type") == "click" &&
          r.getAs[Any]("window_start").toString.startsWith("2024-01-01")
          && r.getAs[Any]("window_start").toString.contains("00:00")).get
      assert(h0click.getAs[Long]("n") == 2)
      assert(math.abs(h0click.getAs[Double]("v") - 3.5) < 1e-9)
    } finally q.stop()
  }

  test("file-source streaming: the real events parquet streamed through the agg matches batch") {
    // drive the actual parquet file as a file-stream source (schema fixed
    // up front, as any production readStream must be)
    val batchDf = graft.Tables.eventsMicros(s, TestSpark.sf)
    // file-stream sources watch a directory — stage the file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(TestSpark.sf + "/events.parquet"),
      dir.resolve("events.parquet"))
    val streamDf = graft.Tables.normalizeTs(s.readStream
      .schema(graft.Tables.events(s, TestSpark.sf).schema)
      .parquet(dir.toString))
    val q = EventStreams.windowAgg(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("graft_file_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = s.table("graft_file_stream")
        .orderBy("window_start", "event_type").collect().map(_.toString)
      val batch = EventStreams.windowAgg(batchDf)
        .orderBy("window_start", "event_type").collect().map(_.toString)
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch binned range join") {
    import s.implicits._
    val clicksIn = MemoryStream[(Long, Long, Timestamp)](s)
    val purchIn = MemoryStream[(Long, Long, Timestamp)](s)
    val clicks = clicksIn.toDF().toDF("event_id", "user_id", "ts")
    val purch = purchIn.toDF().toDF("event_id", "user_id", "ts")

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // purchase 100 at 10:00 (user 1) → window [10:00, 10:30)
    // purchase 101 at 11:00 (user 2) → window [11:00, 11:30)
    purchIn.addData(Seq((100L, 1L, t(10, 0)), (101L, 2L, t(11, 0))))
    // clicks: in-window, at-boundary (excluded), wrong-user, pre-window
    clicksIn.addData(Seq(
      (1L, 1L, t(10, 15)),  // match 100
      (2L, 1L, t(10, 30)),  // hi-exclusive: no match
      (3L, 2L, t(11, 1)),   // match 101
      (4L, 2L, t(10, 15)),  // user 2 before their purchase window: no match
      (5L, 3L, t(10, 15)))) // no purchase for user 3

    val q = EventStreams.clickPurchaseJoinStream(clicks, purch).writeStream
      .outputMode("append").format("memory").queryName("graft_stream_join")
      .start()
    try {
      q.processAllAvailable()
      val got = s.table("graft_stream_join")
        .select("p_event", "c_event").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 1L), (101L, 3L)))
      // cross-check with the batch binned range join over the same rows
      val cBatch = Seq((1L, 1L, t(10, 15)), (2L, 1L, t(10, 30)), (3L, 2L, t(11, 1)),
        (4L, 2L, t(10, 15)), (5L, 3L, t(10, 15)))
        .toDF("event_id", "user_id", "ts")
        .select(col("event_id").as("c_event"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val pBatch = Seq((100L, 1L, t(10, 0)), (101L, 2L, t(11, 0)))
        .toDF("event_id", "user_id", "ts")
        .select(col("user_id"), col("event_id").as("p_event"),
          unix_micros(col("ts")).as("w_lo"),
          (unix_micros(col("ts")) + lit(1800L * 1000000L)).as("w_hi"))
      val batch = graft.operators.TemporalOps
        .rangeJoinBinned(cBatch, pBatch, "user_id", "us", "w_lo", "w_hi", 1800L * 1000000L)
        .select("p_event", "c_event").as[(Long, Long)].collect().toSet
      assert(got == batch, s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("sliding windows: each event lands in exactly two 1h/30m windows") {
    import s.implicits._
    val data = Seq((Timestamp.valueOf("2024-01-01 10:40:00"), "click", 2.0))
    val out = EventStreams.slidingWindowAgg(data.toDF("ts", "event_type", "value"))
      .collect()
    assert(out.length == 2, s"expected the 10:00 and 10:30 windows, got ${out.length}")
    assert(out.forall(_.getAs[Long]("n") == 1L))
    val starts = out.map(_.getAs[Any]("window_start").toString).sorted
    assert(starts.head.contains("10:00") && starts.last.contains("10:30"))
  }

  test("native session_window: gap merge + watermark close, matches sessionizeStream totals") {
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)](s)
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionWindowAgg(events).writeStream
      .outputMode("append").format("memory").queryName("graft_session_win")
      .start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // one session of 3 events within the gap, then a far-future event
      // to advance the watermark and close it
      input.addData(Seq((1L, t(10, 0), 1.0), (1L, t(10, 20), 2.0), (1L, t(10, 35), 3.0)))
      q.processAllAvailable()
      input.addData(Seq((1L, t(20, 0), 0.5)))
      q.processAllAvailable()
      val closed = s.table("graft_session_win").collect()
      assert(closed.length == 1, "exactly the first session should have closed")
      val r = closed.head
      assert(r.getAs[Long]("n_events") == 3L)
      assert(math.abs(r.getAs[Double]("total_value") - 6.0) < 1e-9)
      assert(r.getAs[Any]("session_start").toString.contains("10:00"))
    } finally q.stop()
  }

  test("foreachBatch lands closed windows into the dt-keyed parquet layout") {
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_land").toString
    val input = MemoryStream[(Timestamp, String, Double)](s)
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.landWindowAgg(events, base)
    try {
      input.addData(Seq((Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.5)))
      q.processAllAvailable()
      // advance the watermark far enough to close and emit the 10:00 window
      input.addData(Seq((Timestamp.valueOf("2024-01-01 20:00:00"), "view", 1.0)))
      q.processAllAvailable()
      val landed = s.read.parquet(base)
      assert(landed.columns.contains("dt"), "layout must be dt-partitioned")
      val rows = landed.collect()
      assert(rows.nonEmpty, "closed window must be appended")
      // partition-value inference types dt as DATE on read-back
      assert(rows.forall(_.getAs[Any]("dt").toString == "2024-01-01"))
      assert(rows.exists(r => r.getAs[String]("event_type") == "click" &&
        r.getAs[Long]("n") == 1L))
    } finally q.stop()
  }

  test("stream-static join: streaming events enrich against a batch dim, no state") {
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)](s)
    val events = input.toDF().toDF("user_id", "ts", "value")
    // static side: the rates dim pattern — joined per micro-batch, no
    // streaming state, and it broadcasts like any small dim
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_stream_static").start()
    try {
      input.addData(Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
        (3L, Timestamp.valueOf("2024-01-01 10:01:00"), 7.0)))
      q.processAllAvailable()
      val rows = s.table("graft_stream_static").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
      assert(rows == Map(1L -> "gold", 3L -> null))
    } finally q.stop()
  }

  test("watermark bounds state: late data beyond 2h is dropped in append mode") {
    import s.implicits._
    val input = MemoryStream[(Timestamp, String, Double)](s)
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.streamWindowAgg(events).writeStream
      .outputMode("append").format("memory").queryName("graft_stream_late")
      .start()
    try {
      input.addData(Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0)))
      q.processAllAvailable()
      // advance watermark far past the first window, then send a very late row
      input.addData(Seq((Timestamp.valueOf("2024-01-01 20:00:00"), "click", 1.0)))
      q.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2024-01-01 09:00:00"), "click", 99.0)))
      q.processAllAvailable()
      val out = s.table("graft_stream_late").collect()
      assert(!out.exists(r => r.getAs[Double]("v") == 99.0),
        "late row past the watermark must be dropped")
    } finally q.stop()
  }

  test("streaming sketch landing: merged per-batch partials == exact distinct") {
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, String)](s)
    val events = input.toDF().toDF("user_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_stream").toString
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    val q = EventStreams.landSketchStream(events, dir)
    try {
      // users deliberately split so several APPEAR IN BOTH batches and
      // across days — union must not double-count them
      input.addData(Seq((1L, t(1, 9), "click"), (2L, t(1, 10), "click"),
        (1L, t(2, 9), "click"), (3L, t(1, 9), "view")))
      q.processAllAvailable()
      input.addData(Seq((2L, t(2, 11), "click"), (4L, t(2, 12), "click"),
        (3L, t(2, 9), "view"), (3L, t(2, 10), "click")))
      q.processAllAvailable()
      val est = EventStreams.mergedSketchEstimate(s, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
      // HLL at lgK=14 is exact at these cardinalities
      assert(est("click") == 4L, s"click distinct users: $est") // 1,2,3,4
      assert(est("view") == 1L, s"view distinct users: $est")   // 3
      // the store really is partials: more landed rows than groups
      assert(s.read.parquet(dir).count() >
        EventStreams.mergedSketchEstimate(s, dir).count())
    } finally q.stop()
  }

  test("streaming quantile sketches: merged landed partials == one-shot sketch, within α of exact") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, Double)](s)
    val events = input.toDF().toDF("event_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_qsk_stream").toString
    val q = EventStreams.landQuantileSketchStream(events, dir)
    val b1 = (1 to 60).map(i => (i.toLong, "click", i * 1.0))
    val b2 = (61 to 100).map(i => (i.toLong, "click", i * 1.0)) ++
      Seq((200L, "view", 7.0), (201L, "view", 9.0))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = EventStreams.quantilesFromLanded(s, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Double]("p50_cents"), r.getAs[Double]("p99_cents"),
            r.getAs[Long]("n_partials")))).toMap
      // exact click percentiles in cents: values 1..100 → 100..10000
      val clickExact50 = 5000.0; val clickExact99 = 9900.0
      assert(math.abs(got("click")._1 - clickExact50) / clickExact50 <= 0.01 + 1e-9)
      assert(math.abs(got("click")._2 - clickExact99) / clickExact99 <= 0.01 + 1e-9)
      assert(got("click")._3 == 2L, "click landed one partial per batch")
      // merged landed partials == the one-shot sketch over the union
      val dd = udaf(new graft.functions.DDSketch())
      val direct = (b1 ++ b2).toDF("event_id", "event_type", "value")
        .groupBy("event_type")
        .agg(dd((col("value") * 100).cast("double")).as("sk"))
        .select(col("event_type"),
          graft.functions.DDSketch.sketchQuantile(col("sk"), 0.5).as("p50"),
          graft.functions.DDSketch.sketchQuantile(col("sk"), 0.99).as("p99"))
        .collect().map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Double]("p50"), r.getAs[Double]("p99")))).toMap
      assert(got("click")._1 == direct("click")._1 &&
        got("click")._2 == direct("click")._2,
        "bucket-add merge of landed partials must equal the one-shot sketch")
      // at-least-once replay: re-land batch 0's rows verbatim (a crash
      // between append and checkpoint commit does exactly this); the
      // per-batch_id dedup must keep the answer unchanged
      val landed = s.read.parquet(dir)
      landed.where(col("batch_id") === 0L).write.mode("append").parquet(dir)
      val replayed = EventStreams.quantilesFromLanded(s, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Double]("p50_cents"), r.getAs[Double]("p99_cents"),
            r.getAs[Long]("n_partials")))).toMap
      assert(replayed == got, "a replayed batch must not double-count")
    } finally q.stop()
  }

  test("streaming heavy hitters: landed candidates verify to the exact batch answer") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[String](s)
    val texts = input.toDF().toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    val phi = 0.2
    val q = EventStreams.landHeavyHitterStream(texts, dir, phi)
    // "hot" is heavy only GLOBALLY (present in both batches); each batch
    // also has local-only noise tokens
    val b1 = Seq("hot hot hot alpha beta gamma", "hot delta epsilon")
    val b2 = Seq("hot hot zeta eta theta", "hot iota kappa")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val corpus = (b1 ++ b2).toDF("text")
      val got = EventStreams.heavyHittersFromLanded(s, dir, corpus, phi)
        .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("c")).toMap
      // exact ground truth over the union
      val all = (b1 ++ b2).flatMap(_.split(" "))
      val expect = all.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > all.size * phi).toMap
      assert(got == expect, s"got $got expect $expect")
      // and the store holds bounded per-batch summaries, not raw tokens
      assert(s.read.parquet(dir).count() <= 2 * math.ceil(1 / phi).toLong)
    } finally q.stop()
  }

  test("streaming curation funnel: merged landed partials == batch report; replayed batch doesn't double-count") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[String](s)
    val docs = input.toDF().toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    val q = EventStreams.landCurationFunnelStream(docs, dir)
    def prose(i: Int) = s"document $i discusses unique findings about marine biology and coastal erosion patterns observed during spring"
    // three batches: clean prose, gopher-failing symbol spam,
    // repetition-failing word spam, and cross-batch NORMALIZED dups
    // (case/punctuation variants of the same doc)
    val b1 = (1 to 10).map(prose) ++ Seq("#### !!!! @@@@ %%%% &&&&")
    val b2 = (11 to 18).map(prose) ++
      Seq(prose(1).toUpperCase, "spam spam spam spam spam spam spam spam spam spam spam spam")
    val b3 = (19 to 24).map(prose) ++ Seq(prose(2) + "!!!", prose(3))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
      val got = EventStreams.curationFunnelFromLanded(s, dir).collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_pass")).toMap
      // direct batch funnel over the union corpus, SAME gate expressions
      // (the curation_report aggregation shape)
      val kG = graft.operators.TextOps.gopherKeepExpr(col("text"))
      val kR = graft.operators.TextOps.repetitionKeepExpr(col("text"))
      val direct = (b1 ++ b2 ++ b3).toDF("text")
        .select(kG.as("k_g"), (kG && kR).as("k_both"),
          graft.operators.DedupOps.normalizeText(col("text")).as("norm"))
        .agg(count(lit(1)).as("n_input"),
          sum(when(col("k_g"), 1L).otherwise(0L)).as("n_gopher"),
          sum(when(col("k_both"), 1L).otherwise(0L)).as("n_rep"),
          countDistinct(when(col("k_both"), col("norm"))).as("n_dedup"))
        .collect().head
      // the crafted gates actually bite: some doc fails each stage, and
      // the normalized dups collapse (dedup < repetition survivors)
      assert(direct.getAs[Long]("n_gopher") < direct.getAs[Long]("n_input"))
      assert(direct.getAs[Long]("n_rep") < direct.getAs[Long]("n_gopher"))
      assert(direct.getAs[Long]("n_dedup") < direct.getAs[Long]("n_rep"))
      // gate stages merge EXACTLY (additive sums)
      assert(got("1_input") == direct.getAs[Long]("n_input"))
      assert(got("2_gopher") == direct.getAs[Long]("n_gopher"))
      assert(got("3_repetition") == direct.getAs[Long]("n_rep"))
      // dedup stage is the HLL union — tolerance, and tight at this size
      val exactDedup = direct.getAs[Long]("n_dedup").toDouble
      assert(math.abs(got("4_dedup_normalized") - exactDedup) / exactDedup <= 0.05,
        s"HLL estimate ${got("4_dedup_normalized")} vs exact $exactDedup")
      // at-least-once replay: re-land batch 0's row verbatim; per-batch
      // dedup must keep every stage unchanged
      val landed = s.read.parquet(dir)
      landed.where(col("batch_id") === 0L).write.mode("append").parquet(dir)
      val replayed = EventStreams.curationFunnelFromLanded(s, dir).collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_pass")).toMap
      assert(replayed == got, "a replayed batch must not double-count any stage")
      // pass rates are consistent with the stacked counts
      val rates = EventStreams.curationFunnelFromLanded(s, dir).collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Double]("pass_rate")).toMap
      assert(rates("1_input") == 1.0)
      assert(rates("4_dedup_normalized") ==
        got("4_dedup_normalized").toDouble / got("1_input"))
    } finally q.stop()
  }

  test("streaming dedup: at-least-once re-deliveries collapse to one row each") {
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)](s)
    val events = input.toDF().toDF("event_id", "ts", "value")
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    // batch 1: ids 1,2 with an in-batch duplicate of 1
    input.addData(Seq((1L, t(0), 1.0), (2L, t(1), 2.0), (1L, t(0), 1.0)))
    val q = EventStreams.streamDedup(events).writeStream
      .outputMode("append").format("memory").queryName("graft_dedup_out")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: redelivery of 2 (within watermark) + fresh 3
      input.addData(Seq((2L, t(1), 2.0), (3L, t(5), 3.0)))
      q.processAllAvailable()
      val out = s.table("graft_dedup_out").collect()
      assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L),
        s"each id exactly once, got ${out.mkString(",")}")
    } finally q.stop()
  }
}
