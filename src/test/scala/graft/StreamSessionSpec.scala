package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent

class StreamSessionSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  test("streaming dedup drops re-delivered events within the watermark") {
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, String)](s)
    val events = input.toDF().toDF("event_id", "ts", "payload")
    val q = EventStreams.streamDedup(events).writeStream
      .outputMode("append").format("memory").queryName("graft_stream_dedup")
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 09:00:00")
      input.addData(Seq((1L, t0, "a"), (2L, t0, "b"), (1L, t0, "a-redelivered")))
      q.processAllAvailable()
      input.addData(Seq((2L, t0, "b-redelivered"), (3L, t0, "c")))
      q.processAllAvailable()
      val ids = s.table("graft_stream_dedup").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), s"got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("funnel: order gating on crafted users; streaming funnel == batch funnel") {
    import s.implicits._
    import graft.streaming.EventStreams.TypedEvent
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    // A completes all 3 stages; B clicked BEFORE viewing (step 1 only);
    // C never viewed (0 steps); D purchased before clicking (2 steps)
    val crafted = Seq(
      (1L, "09:00", "view"), (1L, "09:01", "click"), (1L, "09:02", "purchase"),
      (2L, "09:01", "click"), (2L, "09:02", "view"),
      (3L, "09:00", "purchase"), (3L, "09:01", "purchase"),
      (4L, "09:00", "view"), (4L, "09:01", "purchase"), (4L, "09:02", "click"))
    val batch = graft.operators.CoreOps.funnelStepsFrom(
        crafted.map { case (u, hm, ty) => (u, t(hm).getTime * 1000L, ty) }
          .toDF("user_id", "us", "event_type"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    assert(batch == Map("view" -> 3, "click" -> 2, "purchase" -> 1),
      s"batch funnel gating wrong: $batch")

    // streaming twin: same events, deliberately out of order across
    // batches, plus user 5 with TWO activity windows (view-click burst,
    // 3h idle, then a lone purchase) — per-window semantics emit one row
    // per burst, keyed by window_start
    val input = MemoryStream[TypedEvent](s)
    val q = EventStreams.funnelStream(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("graft_funnel")
      .start()
    try {
      val (early, late) = crafted.splitAt(6)
      input.addData(early.reverse.map { case (u, hm, ty) => TypedEvent(u, t(hm), ty) })
      q.processAllAvailable()
      input.addData(late.reverse.map { case (u, hm, ty) => TypedEvent(u, t(hm), ty) }
        ++ Seq(TypedEvent(5L, t("09:00"), "view"), TypedEvent(5L, t("09:01"), "click")))
      q.processAllAvailable()
      // advance the watermark past user 5's 10:01 timeout (event-time
      // timeouts fire when the WATERMARK crosses them — in production
      // arrival tracks event time, so an idle hour really does close the
      // window before the user returns)
      input.addData(Seq(TypedEvent(97L, t("11:30"), "view")))
      q.processAllAvailable()
      // user 5 returns after 3h idle: a NEW activity window
      input.addData(Seq(TypedEvent(5L, t("12:30"), "purchase")))
      q.processAllAvailable()
      // push event time forward so every open buffer times out and emits
      input.addData(Seq(TypedEvent(99L, t("22:00"), "view")))
      q.processAllAvailable()
      input.addData(Seq(TypedEvent(98L, t("23:59"), "view")))
      q.processAllAvailable()
      val out = s.table("graft_funnel").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("window_start").toString.take(16),
          r.getAs[Long]("steps_reached")))
      val oneWindow = out.filter(_._1 <= 4L).map(r => r._1 -> r._3).toMap
      assert(oneWindow == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 2L),
        s"single-window users must equal the batch gating: ${out.mkString(";")}")
      val u5 = out.filter(_._1 == 5L).sortBy(_._2)
      assert(u5.map(r => (r._2, r._3)).toSeq ==
        Seq(("2024-01-01 09:00", 2L), ("2024-01-01 12:30", 0L)),
        s"idle gap must split into two windows with independent gating: ${u5.mkString(";")}")
    } finally q.stop()
  }

  test("stateful streaming sessionization closes sessions on the gap") {
    import s.implicits._
    val input = MemoryStream[SessionEvent](s)
    val q = EventStreams.sessionizeStream(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("graft_sessions")
      .start()
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      // user 1: two bursts 40min apart -> two sessions; user 2: one burst
      input.addData(Seq(
        SessionEvent(1L, t("09:00"), 1.0), SessionEvent(1L, t("09:10"), 2.0),
        SessionEvent(2L, t("09:05"), 5.0)))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(1L, t("09:50"), 4.0)))
      q.processAllAvailable()
      // push event time far forward so every open session times out
      input.addData(Seq(SessionEvent(99L, t("23:00"), 0.0)))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(98L, t("23:59"), 0.0)))
      q.processAllAvailable()

      val out = s.table("graft_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").toString,
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      val u1 = out.filter(_._1 == 1L).sortBy(_._2)
      assert(u1.length == 2, s"user 1 must have 2 sessions, got ${out.mkString(";")}")
      assert(u1(0)._3 == 2 && math.abs(u1(0)._4 - 3.0) < 1e-9) // 09:00 burst
      assert(u1(1)._3 == 1 && math.abs(u1(1)._4 - 4.0) < 1e-9) // 09:50 burst
      val u2 = out.filter(_._1 == 2L)
      assert(u2.length == 1 && u2.head._3 == 1)
    } finally q.stop()
  }

  test("geofence stream-static join: streamed points land in the right regions, outsiders dropped") {
    import s.implicits._
    val boxes = graft.operators.GeoOps.nationBoxes(s, TestSpark.sf)
    val input = MemoryStream[(Long, Double, Double)](s)
    val q = EventStreams.geoAlertStream(
        input.toDF().toDF("event_id", "px", "py"), boxes)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_geofence").start()
    try {
      input.addData(Seq(
        (1L, -180.0, -84.0),  // nation 0 corner
        (2L, -150.0, -70.0),  // nation 0 interior
        (3L, 179.0, 89.0)))   // outside every region
      q.processAllAvailable()
      input.addData(Seq((4L, -100.0, -70.0))) // nation 1's box ([-120,-70]×[-84,-60])
      q.processAllAvailable()
      val got = s.table("graft_geofence").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("region_key"))).toSet
      assert(got == Set((1L, 0), (2L, 0), (4L, 1)), s"got $got")
    } finally q.stop()
  }

  test("streaming attribution == batch per purchase, incl. cross-window carry and late touches") {
    import s.implicits._
    import graft.streaming.EventStreams.AttrEvent
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    // user 1: click, view, 2 purchases, error in one burst — then returns
    //   after >1h idle with a purchase that must credit the carried error.
    // user 2: a history-opening purchase → 'none'.
    // user 3: the click arrives a BATCH LATE between view and purchase —
    //   order-sensitive re-credit (view would be wrong).
    val crafted = Seq(
      (1L, "09:00", 10L, "click", 1.11), (1L, "09:05", 11L, "view", 2.22),
      (1L, "09:10", 12L, "purchase", 10.01), (1L, "09:12", 13L, "purchase", 20.02),
      (1L, "09:15", 14L, "error", 0.0), (1L, "12:00", 15L, "purchase", 30.03),
      (2L, "09:00", 20L, "purchase", 5.55),
      (3L, "09:00", 30L, "view", 0.0), (3L, "09:10", 31L, "click", 0.0),
      (3L, "09:30", 32L, "purchase", 7.77))
    def ev(q: (Long, String, Long, String, Double)) =
      AttrEvent(q._1, t(q._2), q._3, q._4, q._5)

    val input = MemoryStream[AttrEvent](s)
    val q = EventStreams.attributionStream(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("graft_attr").start()
    try {
      // burst 1, deliberately out of order; user 3's click held back
      input.addData((crafted.take(3).reverse ++ crafted.slice(6, 8) :+ crafted(9)).map(ev))
      q.processAllAvailable()
      // the late click + the rest of user 1's burst
      input.addData(Seq(crafted(8), crafted(3), crafted(4)).map(ev))
      q.processAllAvailable()
      // watermark → 10:40: closes every 09:xx window (last+gap ≤ 10:30)
      input.addData(Seq(AttrEvent(97L, t("11:40"), 970L, "view", 0.0)))
      q.processAllAvailable()
      // user 1 returns: a new window seeded by the carried 'error'
      input.addData(Seq(ev(crafted(5))))
      q.processAllAvailable()
      // watermark → 13:30 > 13:00: closes the return window
      input.addData(Seq(AttrEvent(98L, t("14:30"), 980L, "view", 0.0)))
      q.processAllAvailable()

      val got = s.table("graft_attr").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("touch"), r.getAs[Long]("cents"))).toSet
      val batch = graft.operators.FeatureOps.attributionTouches(
          crafted.map { case (u, hm, id, ty, v) =>
            (u, id, t(hm).getTime * 1000L, ty,
              math.floor(v * 100.0 + 0.5).toLong)
          }.toDF("user_id", "event_id", "us", "event_type", "cents"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("touch"), r.getAs[Long]("cents"))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set(
        (1L, 12L, "view", 1001L), (1L, 13L, "view", 2002L),
        (1L, 15L, "error", 3003L),
        (2L, 20L, "none", 555L),
        (3L, 32L, "click", 777L)))
    } finally q.stop()
  }
}
