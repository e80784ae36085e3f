package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, DedupOps, RetrievalOps, SimilarityOps, TextOps}

/** Round-5 operators: repetition gates, BM25 retrieval, mixture
  * accounting/resampling, embedding centroids. */
class Round5OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("dedup_incremental: corpus dups, in-batch dups, and keeps recompute exactly") {
    val docs = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val split = DedupOps.IncrementalSplit
    val corpus = docs.filter(_._1 < split).map(_._2).toSet
    val batch = docs.filter(_._1 >= split).sortBy(_._1)
    val rows = DedupOps.dedupIncremental(s, sf).collect()
    assert(rows.length == batch.length, "one verdict per new-batch doc")
    val seen = collection.mutable.Map.empty[String, Long]
    val expect = batch.map { case (id, text) =>
      val inBatch = seen.contains(text)
      if (!inBatch) seen(text) = id
      id -> ((corpus.contains(text), inBatch))
    }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (ofCorpus, inBatch) = expect(id)
      assert(r.getAs[Boolean]("dup_of_corpus") == ofCorpus, s"doc $id corpus flag")
      assert(r.getAs[Boolean]("dup_in_batch") == inBatch, s"doc $id batch flag")
      assert(r.getAs[Boolean]("keep") == (!ofCorpus && !inBatch), s"doc $id keep")
    }
  }

  test("dedup_incremental: manufactured corpus/batch dups get every flag combination") {
    import s.implicits._
    // corpus: ids 0,1; batch: 10 (dup of corpus), 11+12 (in-batch dup pair),
    // 13 (dup of corpus AND of 10), 14 (fresh)
    val docs = Seq(
      (0L, "aaa"), (1L, "bbb"),
      (10L, "aaa"), (11L, "ccc"), (12L, "ccc"), (13L, "aaa"), (14L, "ddd"))
      .toDF("doc_id", "text")
    val got = DedupOps.dedupIncrementalFrom(docs, 10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("dup_in_batch"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(10L) == ((true, false, false)), "corpus dup, first in batch")
    assert(got(11L) == ((false, false, true)), "first of an in-batch pair keeps")
    assert(got(12L) == ((false, true, false)), "second of the pair drops")
    assert(got(13L) == ((true, true, false)), "dup of corpus and of batch")
    assert(got(14L) == ((false, false, true)), "fresh doc admitted")
    assert(got.size == 5)
  }

  test("rare_token_stats: frequency side broadcasts (no shuffle of the exploded corpus on the power-law tok key)") {
    val plan = TextOps.rareTokenStats(s, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"),
      "vocab-bounded freq table must never sort-merge the exploded corpus on tok")
  }

  test("rare_token_stats: flags match a Scala frequency recompute") {
    val texts = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val freq = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { case (_, t) => t.split(" ", -1).foreach(w => freq(w) += 1) }
    val rows = TextOps.rareTokenStats(s, sf).collect()
    assert(rows.length == texts.length)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      val rare = toks.count(w => freq(w) <= TextOps.RareMaxFreq)
      val r = byId(id)
      assert(r.getAs[Long]("n_tokens") == toks.length, s"doc $id tokens")
      assert(r.getAs[Long]("n_rare") == rare, s"doc $id rare")
      assert(r.getAs[Boolean]("keep") ==
        (rare.toDouble / toks.length <= TextOps.RareMaxFrac), s"doc $id keep")
    }
  }

  test("token_histogram: buckets are bit-lengths and totals reconcile") {
    val rows = CurationOps.tokenHistogram(s, sf).collect()
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"),
        r.getAs[Long]("min_toks"), r.getAs[Long]("max_toks"))
      assert(lo <= hi)
      // every doc in the bucket has bit_length(toks) == bucket
      assert(java.lang.Long.toBinaryString(math.max(lo, 1L)).length == b, s"lo $lo bucket $b")
      assert(java.lang.Long.toBinaryString(math.max(hi, 1L)).length == b, s"hi $hi bucket $b")
    }
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(s, sf).count(), "histogram covers every doc")
  }

  test("repetition_stats: fractions consistent, verified against a Scala recompute") {
    val out = TextOps.repetitionStats(s, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val wn = r.getAs[Long]("words_n")
      val uw = r.getAs[Long]("uniq_words")
      assert(uw >= 1 && uw <= wn)
      assert(r.getAs[Double]("dup_word_frac") == (wn - uw).toDouble / wn)
      val f = r.getAs[Double]("top_word_frac")
      assert(f > 0.0 && f <= 1.0)
    }
    // exact recompute of one document in plain Scala
    val docId = out.head.getAs[Long]("doc_id")
    val text = Tables.documents(s, sf).filter(col("doc_id") === docId)
      .head().getAs[String]("text")
    val w = text.split(" ", -1)
    val g = w.sliding(2).map(_.mkString(" ")).toSeq
    val r = out.head
    assert(r.getAs[Long]("words_n") == w.length)
    assert(r.getAs[Long]("uniq_words") == w.distinct.length)
    assert(r.getAs[Long]("bigrams_n") == (if (w.length >= 2) g.length else 0))
    assert(r.getAs[Long]("top_word_n") ==
      w.groupBy(identity).values.map(_.length).max)
  }

  test("bm25_topk: ranked, and the winner's score matches a Scala recompute") {
    val out = RetrievalOps.bm25Topk(s, sf).collect()
    assert(out.length == RetrievalOps.TopK)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == (1L to RetrievalOps.TopK).toSeq)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })

    // independent recompute over the raw corpus
    val docs = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1)).toMap
    val n = docs.size.toLong
    val sumdl = docs.values.map(_.length.toLong).sum
    val avgdl = sumdl.toDouble / n
    def tf(id: Long, t: String) = docs(id).count(_ == t).toLong
    val dfm = RetrievalOps.QueryTerms.map(t =>
      t -> docs.values.count(_.contains(t)).toLong).toMap
    val top = out.head
    val id = top.getAs[Long]("doc_id")
    val dl = docs(id).length.toLong
    val expect = RetrievalOps.QueryTerms.map { t =>
      val (k1, b) = (RetrievalOps.K1, RetrievalOps.B)
      (n - dfm(t) + 0.5) / (dfm(t) + 0.5) * (tf(id, t) * (k1 + 1)) /
        (tf(id, t) + k1 * (1.0 - b + b * (dl / avgdl)))
    }.reduceLeft(_ + _)
    assert(math.abs(top.getAs[Double]("score") - expect) < 1e-12)
    // and it really is the corpus argmax
    val best = docs.keys.map { d =>
      val ddl = docs(d).length.toLong
      d -> RetrievalOps.QueryTerms.map { t =>
        (n - dfm(t) + 0.5) / (dfm(t) + 0.5) * (tf(d, t) * 2.2) /
          (tf(d, t) + 1.2 * (0.25 + 0.75 * (ddl / avgdl)))
      }.sum
    }.maxBy { case (d, sc) => (sc, -d) }
    assert(best._1 == id)
  }

  test("source_mix: totals reconcile and shares sum to 1") {
    val out = CurationOps.sourceMix(s, sf).collect()
    assert(out.nonEmpty)
    val totalDocs = out.map(_.getAs[Long]("docs_n")).sum
    assert(totalDocs == Tables.documents(s, sf).count())
    val shareSum = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("mixture_sample: deterministic, subset, and rates follow n^alpha") {
    val a = CurationOps.mixtureSample(s, sf).collect()
    val b = CurationOps.mixtureSample(s, sf).collect()
    assert(a.map(_.getAs[Long]("doc_id")).toSeq ==
      b.map(_.getAs[Long]("doc_id")).toSeq, "resample must be bit-stable")
    val nDocs = Tables.documents(s, sf).count()
    assert(a.nonEmpty && a.length < nDocs, "must keep a strict subset")
    // kept volume tracks the budget (binomial tolerance)
    assert(math.abs(a.length.toDouble / nDocs - CurationOps.MixBudget) < 0.1)

    // recompute the per-source rates in Scala and re-apply the same coin:
    // the kept set must match EXACTLY (validates the normalization+join)
    val docs = Tables.documents(s, sf).select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val counts = docs.groupBy(_._2).map { case (src, xs) => src -> xs.size.toLong }
    val z = counts.values.map(n => math.pow(n.toDouble, CurationOps.MixAlpha)).sum
    val total = counts.values.sum
    val rates = counts.map { case (src, n) =>
      src -> math.min(1.0,
        math.pow(n.toDouble, CurationOps.MixAlpha) / z *
          (total.toDouble * CurationOps.MixBudget) / n)
    }
    val us = Tables.documents(s, sf).select(col("doc_id"),
        (pmod(xxhash64(col("doc_id"), lit(42L)), lit(1048576L))
          .cast("double") / lit(1048576.0)).as("u")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("u")).toMap
    val expected = docs.filter { case (id, src) => us(id) < rates(src) }
      .map(_._1).sorted.toSeq
    assert(a.map(_.getAs[Long]("doc_id")).toSeq == expected)
  }

  test("merge_intervals: islands match a brute-force merge per user") {
    import graft.operators.TemporalOps
    val out = TemporalOps.mergeIntervals(s, sf).collect()
    assert(out.nonEmpty)
    // brute-force recompute from the raw purchase events
    val iv = Tables.eventsUs(s, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("lo")).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("lo"), r.getAs[Long]("lo") + 1800L * 1000000L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
    def merge(xs: List[(Long, Long)]): List[(Long, Long, Int)] =
      xs.foldLeft(List.empty[(Long, Long, Int)]) {
        case (Nil, (lo, hi)) => List((lo, hi, 1))
        case ((s0, e0, n0) :: rest, (lo, hi)) =>
          if (lo >= e0) (lo, hi, 1) :: (s0, e0, n0) :: rest
          else (s0, math.max(e0, hi), n0 + 1) :: rest
      }.reverse
    val expected = iv.view.mapValues(merge).toMap
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val got = rows.sortBy(_.getAs[Long]("island_id"))
        .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
          r.getAs[Long]("n_intervals").toInt)).toList
      assert(got == expected(u), s"user $u islands differ")
      // covered == end - start and islands strictly ordered, disjoint
      rows.foreach(r => assert(r.getAs[Long]("covered_us") ==
        r.getAs[Long]("end_us") - r.getAs[Long]("start_us")))
      got.sliding(2).foreach {
        case List((_, e0, _), (s1, _, _)) => assert(s1 >= e0)
        case _ =>
      }
    }
  }

  test("asof_nearest: matches brute-force argmin under the uniform key") {
    import graft.operators.TemporalOps
    val out = TemporalOps.asofNearest(s, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.eventsUs(s, sf)
      .select(col("event_id"), col("user_id"), col("us"),
        col("event_type")).collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id"))
    val expected = clicks.flatMap { c =>
      val u = c.getAs[Long]("user_id"); val cus = c.getAs[Long]("us")
      purchases.get(u).map { ps =>
        val best = ps.minBy(p => (math.abs(p.getAs[Long]("us") - cus),
          p.getAs[Long]("us"), p.getAs[Long]("event_id")))
        (c.getAs[Long]("event_id"),
          (best.getAs[Long]("event_id"), math.abs(best.getAs[Long]("us") - cus)))
      }
    }.toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val e = expected(r.getAs[Long]("event_id"))
      assert(r.getAs[Long]("p_event") == e._1,
        s"click ${r.getAs[Long]("event_id")}: got ${r.getAs[Long]("p_event")} want ${e._1}")
      assert(r.getAs[Long]("delta_us") == e._2)
      assert((r.getAs[String]("direction") == "past") ==
        (r.getAs[Long]("p_us") <= r.getAs[Long]("us")))
    }
    // both directions must actually occur in real data
    assert(out.map(_.getAs[String]("direction")).toSet == Set("past", "future"))
  }

  test("daily_active: totals reconcile with the raw feed") {
    import graft.operators.CoreOps
    val out = CoreOps.dailyActive(s, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(s, sf)
    assert(out.map(_.getAs[Long]("n_events")).sum == ev.count())
    val distinctUsers = ev.select("user_id").distinct().count()
    assert(out.forall(_.getAs[Long]("dau") <= distinctUsers))
    assert(out.map(_.getAs[Long]("dau")).max <= distinctUsers)
  }

  test("hourly_profile: 24-row panel reconciles with the feed") {
    import graft.operators.CoreOps
    val out = CoreOps.hourlyProfile(s, sf).collect()
    assert(out.nonEmpty && out.length <= 24)
    assert(out.map(_.getAs[Long]("hr")).forall(h => h >= 0 && h <= 23))
    assert(out.map(_.getAs[Long]("n_events")).sum == Tables.events(s, sf).count())
  }

  test("cumulative_reach: monotone and totals to the exact distinct user count") {
    import graft.operators.CoreOps
    val out = CoreOps.cumulativeReach(s, sf).collect()
    assert(out.nonEmpty)
    val cums = out.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a }, "strictly rising")
    val distinctUsers = Tables.events(s, sf).select("user_id").distinct().count()
    assert(cums.last == distinctUsers)
    assert(out.map(_.getAs[Long]("new_users")).sum == distinctUsers)
  }

  test("rolling_median: windows bounded at 10, one user matches a Scala recompute") {
    import graft.operators.CoreOps
    val out = CoreOps.rollingMedian(s, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_window") >= 1 &&
      r.getAs[Long]("n_window") <= 10))
    val u = out.head.getAs[Long]("user_id")
    val ev = Tables.eventsUs(s, sf).filter(col("user_id") === u)
      .select(col("us"), col("event_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"),
        math.floor(r.getAs[Double]("value") * 100.0 + 0.5).toLong))
      .sortBy(t => (t._1, t._2))
    val mine = out.filter(_.getAs[Long]("user_id") == u)
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("rolling_median")).toMap
    ev.indices.foreach { i =>
      val frame = ev.slice(math.max(0, i - 9), i + 1).map(_._3).sorted
      val n = frame.length
      val med = if (n % 2 == 1) frame(n / 2).toDouble
        else (frame(n / 2 - 1) + frame(n / 2)).toDouble / 2.0
      assert(mine(ev(i)._2) == med / 100.0, s"row $i of user $u")
    }
  }

  test("rolling_mad_outliers: flags match a Scala MAD recompute for one user") {
    import graft.operators.CoreOps
    val out = CoreOps.rollingMadOutliers(s, sf).collect()
    assert(out.nonEmpty)
    val u = out.head.getAs[Long]("user_id")
    val ev = Tables.eventsUs(s, sf).filter(col("user_id") === u)
      .select(col("us"), col("event_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"),
        math.floor(r.getAs[Double]("value") * 100.0 + 0.5).toLong))
      .sortBy(t => (t._1, t._2))
    def med(xs: Seq[Double]): Double = {
      val s0 = xs.sorted; val n = s0.length
      (s0((n - 1) / 2) + s0(n / 2)) / 2.0
    }
    val mine = out.filter(_.getAs[Long]("user_id") == u)
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    ev.indices.foreach { i =>
      val frame = ev.slice(math.max(0, i - 9), i + 1).map(_._3.toDouble)
      val m = med(frame)
      val mad = med(frame.map(x => math.abs(x - m)))
      val r = mine(ev(i)._2)
      assert(r.getAs[Double]("med_price") == m / 100.0)
      assert(r.getAs[Double]("mad_price") == mad / 100.0)
      val expectFlag = if (mad > 0) math.abs(ev(i)._3 - m) > 3.0 * mad
        else math.abs(ev(i)._3 - m) > 0.0
      assert(r.getAs[Boolean]("is_outlier") == expectFlag, s"row $i user $u")
    }
  }

  test("time_weighted_avg: one user matches an exact BigInt recompute") {
    import graft.operators.TemporalOps
    val out = TemporalOps.timeWeightedAvg(s, sf).collect()
    assert(out.nonEmpty)
    val u = out.head.getAs[Long]("user_id")
    val ev = Tables.eventsUs(s, sf).filter(col("user_id") === u)
      .select(col("us"), col("event_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .sortBy(t => (t._1, t._2))
    val ivs = ev.zip(ev.tail).map { case ((us, _, v), (nus, _, _)) =>
      (BigInt(math.floor(v * 100.0 + 0.5).toLong), BigInt(nus - us))
    }
    val wsum = ivs.map { case (c, d) => c * d }.sum
    val wtot = ivs.map(_._2).sum
    val r = out.head
    assert(r.getAs[Long]("n_intervals") == ivs.length.toLong)
    assert(r.getAs[Long]("held_us") == wtot.toLong)
    assert(math.abs(r.getAs[Double]("twa") -
      wsum.toDouble / wtot.toDouble / 100.0) < 1e-9)
    // a TWA must sit inside the observed value range
    val vals = ev.map(_._3)
    assert(r.getAs[Double]("twa") >= vals.min - 1e-9 &&
      r.getAs[Double]("twa") <= vals.max + 1e-9)
  }

  test("event_transitions: rows sum to 1 and cells match the pair count") {
    import graft.operators.CoreOps
    val out = CoreOps.eventTransitions(s, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("from_type")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
    // total transition count = events − one tail event per active user
    val ev = Tables.events(s, sf)
    val expectedPairs = ev.count() - ev.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum == expectedPairs)
  }

  test("merge_upsert: replaces, inserts, tombstones; base otherwise intact") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "name", "v").write.parquet(dir)
    val changes = Seq((2L, "B2", 21L, false), (5L, "e", 50L, false),
      (3L, "", 0L, true)).toDF("id", "name", "v", "_deleted")
    val n = Jobs.mergeUpsert(s, dir, changes, "id")
    assert(n == 4L)
    val got = s.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Long]("v")))
      .sortBy(_._1).toList
    assert(got == List((1L, "a", 10L), (2L, "B2", 21L), (4L, "d", 40L), (5L, "e", 50L)))
    // idempotent retry: same batch again → same table
    assert(Jobs.mergeUpsert(s, dir, changes, "id") == 4L)
    // a NULL _deleted flag means "not deleted": the row must be UPSERTED,
    // not silently removed (common CDC encoding stamps only deletes)
    val nullFlag = Seq((4L, "D4", 41L)).toDF("id", "name", "v")
      .withColumn("_deleted", lit(null).cast("boolean"))
    assert(Jobs.mergeUpsert(s, dir, nullFlag, "id") == 4L)
    val after = s.read.parquet(dir).filter(col("id") === 4L).collect()
    assert(after.length == 1 && after.head.getAs[String]("name") == "D4")
    // two change rows for one key must be rejected, not land as dup rows
    val dupBatch = Seq((7L, "x", 1L), (7L, "y", 2L)).toDF("id", "name", "v")
    val e = intercept[IllegalArgumentException](Jobs.mergeUpsert(s, dir, dupBatch, "id"))
    assert(e.getMessage.contains("multiple rows"))
  }

  test("session_window_agg: native batch session_window matches the lag-gap core") {
    import graft.operators.CoreOps
    val out = CoreOps.sessionWindowAgg(s, sf).collect()
    assert(out.nonEmpty)
    // events are partitioned exactly: per-user n_events sums to the feed
    val perUser = out.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    val feed = Tables.events(s, sf).groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(perUser == feed)
    // same session structure as the lag-gap sessionization (no event in
    // this corpus lands exactly ON a gap boundary, where the native
    // operator's >= rule and sessionize's > rule legitimately differ)
    val lagGap = CoreOps.sessionizeStats(s, sf).collect()
    assert(out.length == lagGap.length)
    out.foreach { r =>
      assert(r.getAs[java.time.LocalDateTime]("session_end")
        .isAfter(r.getAs[java.time.LocalDateTime]("session_start")))
    }
  }

  test("group_heavy_hitters: per-lang exact counts above the group threshold") {
    val out = TextOps.groupHeavyHitters(s, sf).collect()
    assert(out.nonEmpty)
    // brute-force ground truth per lang
    val docs = Tables.documents(s, sf).select("lang", "text").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[String]("text"))
    val byLang = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2.split(" ", -1))).toMap
    val expect = byLang.flatMap { case (lang, toks) =>
      toks.groupBy(identity).collect {
        case (t, xs) if xs.length > toks.length * 0.01 => (lang, t) -> xs.length.toLong
      }
    }
    val got = out.map(r => (r.getAs[String]("lang"), r.getAs[String]("tok")) ->
      r.getAs[Long]("c")).toMap
    assert(got == expect, s"diff: ${(got.keySet diff expect.keySet) ++ (expect.keySet diff got.keySet)}")
  }

  test("dq_checks: violation counts match direct recomputes") {
    import graft.operators.QualityOps
    val out = QualityOps.dqChecks(s, sf).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("checked"), r.getAs[Boolean]("pass"))).toMap
    assert(out.size == 6)
    assert(out("customer_pk_unique")._2 == Tables.customer(s, sf).count())
    val orders = Tables.orders(s, sf)
    val nOrders = orders.count()
    assert(out("orders_pk_unique")._2 == nOrders)
    assert(out("orders_pk_unique")._1 ==
      nOrders - orders.select("o_orderkey").distinct().count())
    assert(out("orders_price_nonneg")._1 ==
      orders.filter(col("o_totalprice") < 0).count())
    val orphans = orders.join(Tables.customer(s, sf),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(out("orders_custkey_ri")._1 == orphans)
    assert(out("lineitem_qty_range")._2 == Tables.lineitem(s, sf).count())
    out.foreach { case (_, (v, _, pass)) => assert(pass == (v == 0L)) }
  }

  test("knn_classify: majority vote over the top-k neighbor labels") {
    import graft.operators.SimilarityOps
    val out = SimilarityOps.knnClassify(s, sf).collect()
    assert(out.nonEmpty)
    val labels = Tables.embeddings(s, sf).select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val nn = SimilarityOps.annCosineTopK(s, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
    assert(out.length == nn.size)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val voteCounts = nn(q).map(x => labels(x.getAs[Long]("n_id")))
        .groupBy(identity).view.mapValues(_.size).toMap
      val expectPred = voteCounts.toSeq.minBy { case (l, c) => (-c, l) }
      assert(r.getAs[Int]("pred_label") == expectPred._1)
      assert(r.getAs[Long]("votes") == expectPred._2.toLong)
      assert(r.getAs[Int]("true_label") == labels(q))
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Int]("pred_label") == labels(q)))
    }
  }

  test("embedding_centroids: counts right, one cell matches exact recompute") {
    val out = SimilarityOps.embeddingCentroids(s, sf).collect()
    assert(out.nonEmpty)
    val rows = Tables.embeddings(s, sf).select("label", "embedding").collect()
      .map(r => r.getAs[Int]("label") -> r.getSeq[Float](1))
    val label = out.head.getAs[Int]("label")
    val members = rows.filter(_._1 == label).map(_._2)
    val cell = out.filter(r => r.getAs[Int]("label") == label &&
      r.getAs[Long]("dim") == 1L).head
    assert(cell.getAs[Long]("n") == members.length.toLong)
    val sumE6 = members.map(v => math.floor(v(0).toDouble * 1000000.0 + 0.5).toLong).sum
    assert(cell.getAs[Double]("centroid") ==
      sumE6.toDouble / members.length / 1000000.0)
    // every (label, dim) cell covers all of that label's vectors
    out.foreach { r =>
      val lbl = r.getAs[Int]("label")
      assert(r.getAs[Long]("n") == rows.count(_._1 == lbl).toLong)
    }
  }
}
