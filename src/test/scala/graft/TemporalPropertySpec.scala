package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalOps

/** Randomized properties for the temporal joins and the heavy-hitter
  * sketch (scalacheck generators, plain scalatest driver): each one
  * compares the optimized operator against a brute-force definition on
  * generated data, so the invariants hold beyond the curated sf corpus. */
class TemporalPropertySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  test("asofJoin equals the brute-force latest-at-or-before on random streams") {
    import s.implicits._
    val gen = for {
      k <- Gen.choose(1L, 6L)
      t <- Gen.choose(0L, 1000L)
    } yield (k, t)
    val leftRaw = Gen.listOfN(120, gen).sample.get.distinct
    val rightRaw = Gen.listOfN(80, gen).sample.get.distinct
      .groupBy(identity).keys.toSeq // unique (k, t) on the right
    val left = leftRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    val right = rightRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000L) }
      .toDF("k", "t", "rid")

    val got = TemporalOps.asofJoin(left, right, "k", "t", "m")
      .select(col("lid"), col("m.rid").as("rid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val rightScala = rightRaw.zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong + 1000L) }
    val want = leftRaw.zipWithIndex.map { case ((k, t), i) =>
      val cands = rightScala.filter(r => r._1 == k && r._2 <= t)
      i.toLong -> (if (cands.isEmpty) -1L else cands.maxBy(_._2)._3)
    }.toMap
    assert(got == want)
  }

  test("rangeJoinBinned equals the brute-force inequality join for any bin width") {
    import s.implicits._
    val pGen = for { k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 500L) } yield (k, t)
    val iGen = for {
      k <- Gen.choose(1L, 4L); lo <- Gen.choose(0L, 450L); len <- Gen.choose(1L, 120L)
    } yield (k, lo, lo + len)
    val pts = Gen.listOfN(100, pGen).sample.get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val ivs = Gen.listOfN(40, iGen).sample.get
      .zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) }
    val ptsDf = pts.toDF("k", "t", "pid")
    val ivsDf = ivs.toDF("k", "lo", "hi", "wid")

    val want = (for {
      (pk, t, pid) <- pts
      (ik, lo, hi, wid) <- ivs
      if pk == ik && t >= lo && t < hi
    } yield (wid, pid)).toSet

    for (bin <- Seq(7L, 64L, 1000L)) {
      val got = TemporalOps.rangeJoinBinned(ptsDf, ivsDf, "k", "t", "lo", "hi", bin)
        .select("wid", "pid").as[(Long, Long)].collect().toSet
      assert(got == want, s"bin=$bin: ${got.size} vs ${want.size}")
    }
  }

  test("rangeJoinLadder equals brute force on mixed-width random intervals") {
    import s.implicits._
    val pGen = for { k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 2000000L) } yield (k, t)
    // spans from 1 to ~1M: three orders of magnitude in one input — the
    // case single-width binning handles badly either way
    val iGen = for {
      k <- Gen.choose(1L, 4L)
      lo <- Gen.choose(0L, 1900000L)
      len <- Gen.choose(0, 2).flatMap {
        case 0 => Gen.choose(1L, 50L)
        case 1 => Gen.choose(1000L, 5000L)
        case _ => Gen.choose(200000L, 1000000L)
      }
    } yield (k, lo, lo + len)
    val pts = Gen.listOfN(150, pGen).sample.get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val ivs = Gen.listOfN(60, iGen).sample.get
      .zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) }

    val want = (for {
      (pk, t, pid) <- pts
      (ik, lo, hi, wid) <- ivs
      if pk == ik && t >= lo && t < hi
    } yield (wid, pid)).toSet

    val got = TemporalOps.rangeJoinLadder(
        pts.toDF("k", "t", "pid"), ivs.toDF("k", "lo", "hi", "wid"),
        "k", "t", "lo", "hi", baseWidth = 64L, levels = 16)
      .select("wid", "pid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "ladder join must not duplicate pairs")
    assert(got.toSet == want, s"${got.length} vs ${want.size}")
  }

  test("rangeJoinLadder: every interval emits at most two bins at its level") {
    import s.implicits._
    // directly observable consequence: candidate volume before the exact
    // filter stays ~2 rows per interval even for very wide intervals
    val ivs = Seq((1L, 0L, 1000000L, 0L), (1L, 5L, 6L, 1L)).toDF("k", "lo", "hi", "wid")
    val pts = Seq((1L, 5L, 0L)).toDF("k", "t", "pid")
    // with baseWidth 64 the 1e6-wide interval sits at level 14 (64*2^14 >= 1e6)
    val out = TemporalOps.rangeJoinLadder(pts, ivs, "k", "t", "lo", "hi", 64L)
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 0L), (1L, 0L)))
  }

  test("misra-gries guarantee holds on random zipf-ish streams") {
    import s.implicits._
    val gen = Gen.frequency(
      (40, Gen.const("h1")), (20, Gen.const("h2")), (10, Gen.const("h3")),
      (30, Gen.choose(1, 500).map(i => s"tail_$i")))
    val data = Gen.listOfN(3000, gen).sample.get
    val n = data.length
    val k = 10
    val mg = udaf(new graft.functions.MisraGries(k))
    val sketch = data.toDF("tok").repartition(6)
      .agg(mg(col("tok"))).head().getAs[Map[String, Long]](0)
    assert(sketch.size <= k)
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    trueCounts.filter(_._2 > n.toLong / k).keys.foreach { heavy =>
      assert(sketch.contains(heavy), s"$heavy (count ${trueCounts(heavy)}) evicted")
    }
    sketch.foreach { case (t, est) =>
      assert(est <= trueCounts(t), "estimate must never overcount")
      assert(est >= trueCounts(t) - n.toLong / k, "undercount bound violated")
    }
  }

  test("asofNearest equals brute-force argmin on colliding random timestamps") {
    import s.implicits._
    // tiny time domain on purpose: equal click/purchase timestamps and
    // equal past/future deltas must hit the tie-break path constantly
    val gen = for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 10L)
      kind <- Gen.oneOf("click", "purchase")
    } yield (u, t, kind)
    val rows = Gen.listOfN(150, gen).sample.get.zipWithIndex
      .map { case ((u, t, k), i) => (i.toLong, u, t, k) }
    val ev = rows.toDF("event_id", "user_id", "us", "event_type")

    val got = TemporalOps.asofNearestEvents(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("p_event"), r.getAs[Long]("delta_us"))).toMap

    val purchases = rows.filter(_._4 == "purchase")
    val want = rows.filter(_._4 == "click").flatMap { case (cid, u, cus, _) =>
      val cands = purchases.filter(_._2 == u)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (pid, _, pus, _) =>
          (math.abs(pus - cus), pus, pid)
        }
        Some(cid -> (best._1, math.abs(best._3 - cus)))
      }
    }.toMap
    assert(got == want)
  }

  test("mergeIntervals equals brute-force island merge incl. exact-touch boundaries") {
    import s.implicits._
    val half = 1800L * 1000000L
    // half-width grid → intervals that exactly TOUCH (half-open: must NOT
    // merge) and exactly coincide, per user
    val gen = for {
      u <- Gen.choose(1L, 3L)
      g <- Gen.choose(0L, 16L)
    } yield (u, g * (half / 2))
    val rows = Gen.listOfN(80, gen).sample.get.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t, "purchase") }
    val ev = rows.toDF("event_id", "user_id", "us", "event_type")

    val got = TemporalOps.mergeIntervalsEvents(ev).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("island_id"))
        .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
          r.getAs[Long]("n_intervals"))).toList).toMap

    val want = rows.groupBy(_._2).view.mapValues { rs =>
      rs.map(r => (r._3, r._3 + half)).sortBy(_._1)
        .foldLeft(List.empty[(Long, Long, Long)]) {
          case (Nil, (lo, hi)) => List((lo, hi, 1L))
          case ((s0, e0, n0) :: rest, (lo, hi)) =>
            if (lo >= e0) (lo, hi, 1L) :: (s0, e0, n0) :: rest
            else (s0, math.max(e0, hi), n0 + 1L) :: rest
        }.reverse
    }.toMap
    assert(got == want)
  }
}
