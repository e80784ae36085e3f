package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FeatureOps, TextOps}

/** Feature-generation / mining operators: lag features, exact rank
  * normalization on the collapsed frame, blocked fuzzy vocabulary join,
  * co-occurrence lift, last-touch attribution, char diversity. */
class FeatureOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("lag_features: lag/delta/gap/trailing-frame consistency per user") {
    val rows = FeatureOps.lagFeatures(s, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
      ordered.zipWithIndex.foreach { case (r, i) =>
        if (i == 0) {
          assert(r.isNullAt(r.fieldIndex("prev_cents")), "history opens null")
          assert(r.getAs[Long]("n_prev3") == 0L)
        } else {
          val prev = ordered(i - 1)
          assert(r.getAs[Long]("prev_cents") == prev.getAs[Long]("cents"))
          assert(r.getAs[Long]("delta_cents") ==
            r.getAs[Long]("cents") - prev.getAs[Long]("cents"))
          assert(r.getAs[Long]("gap_us") == r.getAs[Long]("us") - prev.getAs[Long]("us"))
          val lo = math.max(0, i - 3)
          assert(r.getAs[Long]("n_prev3") == (i - lo).toLong)
          assert(r.getAs[Long]("sum_prev3_cents") ==
            (lo until i).map(ordered(_).getAs[Long]("cents")).sum)
        }
      }
    }
  }

  test("rank_normalize: collapsed-frame ranks == direct percent_rank over the fact") {
    val got = FeatureOps.rankNormalize(s, sf)
      .select("doc_id", "pr", "decile").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("pr"), r.getAs[Long]("decile")))
      .toSet
    // the skew-prone formulation this op deliberately avoids — same math
    val w = Window.partitionBy("source").orderBy("n_chars")
    val direct = Tables.documents(s, sf)
      .select(col("doc_id"), percent_rank().over(w).as("pr"))
      .select(col("doc_id"), col("pr"),
        least(floor(col("pr") * 10).cast("long"), lit(9L)).as("decile"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("pr"), r.getAs[Long]("decile")))
      .toSet
    assert(got == direct)
    got.foreach { case (_, pr, dec) =>
      assert(pr >= 0.0 && pr <= 1.0); assert(dec >= 0L && dec <= 9L)
    }
  }

  test("string_sim_join: blocked equi-join == brute force, incl. length-edge pairs") {
    import s.implicits._
    val vocab = Seq("alpha", "alphb", "alphaxy", "beta", "betaxx",
      "gamma", "gamm", "delta", "zzzzzzz").toDF("tok")
    val got = FeatureOps.stringSimPairs(vocab).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val toks = vocab.as[String].collect()
    val brute = (for {
      a <- toks; b <- toks if a < b
      d = lev(a, b) if d <= FeatureOps.FuzzyMaxEdit
    } yield (a, b, d.toLong)).toSet
    assert(got == brute)
    // the ±2-length edge pair must survive the blocking
    assert(got.contains(("alpha", "alphaxy", 2L)))
    // and the plan is an equi-join on the length key, never a cartesian
    val plan = FeatureOps.stringSimPairs(vocab).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"blocked join must not be cartesian:\n$plan")
  }

  test("cooccurrence_pairs: counts recompute from raw events; lift is the exact ratio") {
    val ev = Tables.eventsMicros(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.get(1).toString, r.getAs[String]("event_type")))
    val byGroup = ev.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet).toMap
    val g = byGroup.size.toLong
    val typeCount = ev.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val expect = byGroup.values.flatMap(ts =>
      ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = FeatureOps.cooccurrencePairs(s, sf)
    val rows = df.collect()
    // the persisted contexts frame collapses the four consumers to ONE
    // events scan: every reference reads the cache (the only parquet scan
    // lives INSIDE the cached relation, so none appears in the tree)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(1500))
    // recursive scan counter that descends AQE stages (collect() does
    // not traverse a materialized QueryStageExec) but NOT cached
    // relations or reused exchanges — i.e. it counts distinct physical
    // parquet reads the query itself would execute
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive._
      p match {
        case _: FileSourceScanExec => 1
        case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
        case q: QueryStageExec => scansIn(q.plan)
        case _: exchange.ReusedExchangeExec => 0
        case _: columnar.InMemoryTableScanLike => 0
        case other => other.children.map(scansIn).sum
      }
    }
    def countScans(d: org.apache.spark.sql.DataFrame): Int =
      scansIn(d.queryExecution.executedPlan)
    // control: the counter itself sees a direct scan on an uncached query
    // (guards against the assert below passing vacuously)
    val control = Tables.eventsMicros(s, sf).groupBy("event_type").count()
    control.collect()
    assert(countScans(control) >= 1, "scan counter sanity")
    assert(countScans(df) == 0,
      s"every events read must go through the cache, saw ${countScans(df)} direct scans")
    s.catalog.clearCache() // documented contract: caller drops the persist
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    rows.foreach { r =>
      val (a, b, nAb) = (r.getString(0), r.getString(1), r.getAs[Long]("n_ab"))
      assert(nAb == expect((a, b)))
      assert(r.getAs[Double]("lift") ==
        (nAb * g).toDouble / (typeCount(a) * typeCount(b)).toDouble)
    }
  }

  test("attribution_last_touch: conversions and value are fully conserved") {
    val purchases = Tables.events(s, sf).where(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        (sum(graft.functions.Det.e2(col("value"))).cast("double") / lit(100.0)).as("v"))
      .collect().head
    val rows = FeatureOps.attributionLastTouch(s, sf).collect()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum == purchases.getAs[Long]("n"))
    assert(math.abs(rows.map(_.getAs[Double]("attributed_value")).sum -
      purchases.getAs[Double]("v")) < 1e-6)
    val touches = rows.map(_.getAs[String]("touch")).toSet
    assert(!touches.contains("purchase"), "a purchase never credits itself")
  }

  test("spatial_join: grid-bucketed containment == brute force; equi-join plan, boundary points kept") {
    import s.implicits._
    import graft.operators.GeoOps
    // boxes on the production layout + points planted on corners, edges,
    // interiors, just-outside, and cell borders
    val boxes = GeoOps.nationBoxes(s, sf)
    val planted = Seq(
      (9000001L, -180.0, -84.0),   // nation 0 corner (inclusive)
      (9000002L, -130.0, -60.0),   // nation 0 far corner (inclusive)
      (9000003L, -129.99, -60.0),  // just outside in x
      (9000004L, -150.0, -70.0),   // nation 0 interior, crosses cell border x=-150
      (9000005L, 0.0, 0.0),        // in nation 15's box? compute below
      (9000006L, 179.0, 89.0))     // outside every box
      .toDF("event_id", "px", "py")
    val got = GeoOps.spatialJoinFrames(boxes, planted)
      .select("event_id", "n_nationkey").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("n_nationkey"))).toSet
    val brute = (for {
      b <- boxes.collect()
      p <- planted.collect()
      lon0 = b.getAs[Double]("lon0"); lat0 = b.getAs[Double]("lat0")
      px = p.getAs[Double]("px"); py = p.getAs[Double]("py")
      if px >= lon0 && px <= lon0 + GeoOps.BoxW && py >= lat0 && py <= lat0 + GeoOps.BoxH
    } yield (p.getAs[Long]("event_id"), b.getAs[Int]("n_nationkey"))).toSet
    assert(got == brute)
    assert(got.contains((9000001L, 0)) && got.contains((9000002L, 0)))
    assert(!got.exists(_._1 == 9000003L) && !got.exists(_._1 == 9000006L))
    assert(got.exists(_._1 == 9000004L))
    // the full operator also matches a brute-force recompute on real events
    val full = GeoOps.spatialJoin(s, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[Long]("n_points")).toMap
    val bruteFull = GeoOps.spatialJoinFrames(boxes, GeoOps.eventPoints(s, sf))
    val plan = bruteFull.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"grid join must stay an equi-join:\n$plan")
    assert(full.values.sum == bruteFull.count())
  }

  test("ab_test: cohort moments, Welch t, and the experimental unit recompute by hand") {
    val perUser = Tables.events(s, sf)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(graft.functions.Det.e2(col("value")).cast("long")).as("x"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("x")))
    def moments(xs: Seq[Long]) = {
      val n = xs.length.toLong
      val mean = xs.sum.toDouble / n
      val v = (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / n) / (n - 1)
      (n, mean, v)
    }
    val (na, ma, va) = moments(perUser.filter(_._1 % 2 == 0).map(_._2).toSeq)
    val (nb, mb, vb) = moments(perUser.filter(_._1 % 2 != 0).map(_._2).toSeq)
    val r = FeatureOps.abTest(s, sf).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean_b") - mb) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") -
      (mb - ma) / math.sqrt(va / na + vb / nb)) < 1e-9)
    // the unit is the USER: n_a+n_b is purchasing users, not purchases
    assert(na + nb == perUser.length)
  }

  test("dedup_normalized: case/punctuation/whitespace variants collapse, real dups superset") {
    import s.implicits._
    import graft.operators.DedupOps
    val variants = Seq("Hello, World!", "hello world", "  HELLO -- WORLD  ",
      "hello	world")
    // all four normalize to "hello world" except the tab variant (split
    // strips only [^a-z0-9 ] and literal-space runs; tab is punctuation
    // class? no — it is stripped by [^a-z0-9 ] since tab != space)
    val norms = variants.toDF("text")
      .select(DedupOps.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(norms.toSet == Set("hello world"), s"got ${norms.toSet}")
    // on the corpus: normalized dedup can only MERGE groups vs exact dedup
    val exactGroups = DedupOps.dedupExact(s, sf).count()
    val normGroups = DedupOps.dedupNormalized(s, sf).count()
    assert(normGroups <= exactGroups)
    val totalExact = DedupOps.dedupExact(s, sf)
      .agg(sum("n_dups")).head().getLong(0)
    val totalNorm = DedupOps.dedupNormalized(s, sf)
      .agg(sum("n_dups")).head().getLong(0)
    assert(totalExact == totalNorm, "every doc still lands in exactly one group")
  }

  test("gopher_gates: crafted docs trip each rule; clean prose passes") {
    import s.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "a b c d e f g h i j"),                  // mean word len 1 → fail
      (2L, "### ## # ### word"),                    // symbol ratio → fail
      // 2/3 bullet lines (< 0.9) and only 1/7 alpha-less "-" token (> 0.8)
      (3L, "- one two\n- three four\nplain line here"),
      (4L, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"), // all bullets → fail
      (5L, "this trails off...\nand again...\nmore...\nplain line here"), // 3/4 ellipsis → fail
      (6L, "12345 67890 11111 22222 33333"))        // no alpha words → fail
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("t").as("source"), length(col("text")).cast("long").as("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.TextOps.gopherGates(s, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got(0L), "clean prose passes every gate")
    assert(!got(1L) && !got(2L) && !got(4L) && !got(5L) && !got(6L))
    assert(got(3L), "a minority of bullet lines is fine")
  }

  test("curation_report: monotone funnel, rates consistent, dedup stage recomputes") {
    import graft.operators.{CurationOps, DedupOps, TextOps}
    val rows = CurationOps.curationReport(s, sf).collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("n_pass"), r.getAs[Double]("pass_rate")))).toMap
    val ns = Seq("1_input", "2_gopher", "3_repetition", "4_dedup_normalized")
      .map(rows(_)._1)
    assert(ns == ns.sorted.reverse, s"attrition must be monotone: $ns")
    assert(rows("1_input")._2 == 1.0)
    rows.values.foreach { case (n, rate) =>
      assert(rate == n.toDouble / ns.head, "rates derive from the input count")
    }
    // stage 4 == distinct canonical hashes among gopher∧repetition survivors
    val gk = TextOps.gopherGates(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val rk = TextOps.repetitionStats(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val survivors = Tables.documents(s, sf)
      .select(col("doc_id"), DedupOps.normalizeText(col("text")).as("n")).collect()
      .filter(r => gk(r.getAs[Long]("doc_id")) && rk(r.getAs[Long]("doc_id")))
    assert(rows("4_dedup_normalized")._1 ==
      survivors.map(_.getAs[String]("n")).distinct.length.toLong)
  }

  test("mix_drift: shares sum to 1 per drop, chi-square parts recompute by hand") {
    import graft.operators.{CurationOps, DedupOps}
    val rows = CurationOps.mixDrift(s, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share_old")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("share_new")).sum - 1.0) < 1e-9)
    val toks = Tables.documents(s, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("t")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("t")))
    val cut = DedupOps.IncrementalSplit
    val nOld = toks.filter(_._1 < cut).map(_._3).sum
    val nNew = toks.filter(_._1 >= cut).map(_._3).sum
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val tOld = toks.filter(t => t._1 < cut && t._2 == src).map(_._3).sum
      val tNew = toks.filter(t => t._1 >= cut && t._2 == src).map(_._3).sum
      assert(r.getAs[Long]("t_old") == tOld && r.getAs[Long]("t_new") == tNew)
      val expected = tOld.toDouble * nNew / nOld
      assert(math.abs(r.getAs[Double]("chi2_part") -
        (tNew - expected) * (tNew - expected) / expected) < 1e-6)
      assert(r.getAs[Double]("chi2_part") >= 0.0)
    }
  }

  test("char_diversity: manufactured docs hit the closed-form values") {
    import s.implicits._
    val docs = Seq(
      (0L, "aaaa"),      // one char: simpson 0, eff 1
      (1L, "abab"),      // two chars even: simpson 0.5, eff 2
      (2L, "abcd"),      // all distinct: simpson 1-4/16, eff 4
      (3L, "aab"))       // 2:1 split: sumsq 5, n 3
      .toDF("doc_id", "text")
    val got = TextOps.charDiversityDocs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("distinct_chars"),
          r.getAs[Double]("simpson"), r.getAs[Double]("eff_chars")))).toMap
    assert(got(0L) == ((4L, 1L, 0.0, 1.0)))
    assert(got(1L) == ((4L, 2L, 0.5, 2.0)))
    assert(got(2L) == ((4L, 4L, 0.75, 4.0)))
    assert(got(3L) == ((3L, 2L, 1.0 - 5.0 / 9.0, 9.0 / 5.0)))
  }

  test("trend_agg: OLS moments recompute exactly; a linear series gives its exact slope") {
    val monthly = Tables.orders(s, sf)
      .groupBy(col("o_orderpriority").as("p"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(graft.functions.Det.e2(col("o_totalprice")).cast("long")).as("y"))
      .collect().map(r => (r.getAs[String]("p"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    val rows = FeatureOps.trendAgg(s, sf).collect()
    rows.foreach { r =>
      val g = monthly.filter(_._1 == r.getAs[String]("priority"))
      val (n, sx, sy) = (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(r.getAs[Long]("n_months") == n)
      assert(r.getAs[Double]("slope_cents") == slope)
      assert(r.getAs[Double]("intercept_cents") ==
        (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    }
    assert(rows.nonEmpty)
  }

  test("snapshot_diff: every status and the balance-change count recompute by hand") {
    import s.implicits._
    val cust = (1L to 100L).map(k => (k, k * 1.5, if (k % 2 == 0) "A" else "B"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val got = graft.operators.QualityOps.snapshotDiffFrom(cust).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_bal_changed")))).toMap
    val removed = (1L to 100L).count(_ % 10 == 0)           // delete wins on overlap
    val added = (1L to 100L).count(_ % 13 == 0)
    val changed = (1L to 100L).count(k => k % 10 != 0 && k % 7 == 0)
    val unchanged = 100 - removed - changed
    assert(got("removed") == ((removed.toLong, 0L)))
    assert(got("added") == ((added.toLong, 0L)))
    assert(got("changed") == ((changed.toLong, changed.toLong)))
    assert(got("unchanged") == ((unchanged.toLong, 0L)))
  }

  test("embedding_norm_stats: per-row fold == posexplode recompute on real vectors") {
    val got = graft.operators.SimilarityOps.embeddingNormStats(s, sf).collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("avg_norm"), r.getAs[Double]("max_norm"))))
      .toMap
    val n6Per = Tables.embeddings(s, sf)
      .select(col("label").cast("long").as("label"), col("vec_id"),
        explode(col("embedding")).as("v"))
      .withColumn("v6", floor(col("v").cast("double") * 1000000.0 + 0.5).cast("long"))
      .groupBy("label", "vec_id").agg(sum(col("v6") * col("v6")).as("ss"))
      .select(col("label"),
        floor(sqrt(col("ss").cast("double")) + 0.5).cast("long").as("n6"))
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("n6")))
    val byLabel = n6Per.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == byLabel.keySet)
    byLabel.foreach { case (l, n6s) =>
      assert(got(l)._1 == n6s.length.toLong)
      assert(got(l)._2 == n6s.sum.toDouble / 1000000.0 / n6s.length)
      assert(got(l)._3 == n6s.max.toDouble / 1000000.0)
      // embeddings are ~unit-normalized: norms must sit near 1
      assert(got(l)._2 > 0.5 && got(l)._2 < 2.0)
    }
  }

  test("char_diversity: native CharStats == fold twin, incl. non-ASCII and surrogate pairs") {
    import s.implicits._
    val docs = Seq(
      (0L, "héllo wörld"),            // latin-1 spillover path
      (1L, "日本語テキスト日本"),        // all non-ASCII
      (2L, "😀a😀"), // surrogate pairs: n=3, distinct=2
      (3L, "plain ascii text"),
      (4L, "x"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("distinct_chars"),
          r.getAs[Double]("simpson"), r.getAs[Double]("eff_chars")))).toMap
    val native = run(TextOps.charDiversityDocs(docs))
    val fold = run(TextOps.charDiversityDocsFold(docs))
    assert(native == fold)
    assert(native(2L)._1 == 3L, "surrogate pair counts as ONE char")
    assert(native(2L)._2 == 2L)
    assert(native(4L) == ((1L, 1L, 0.0, 1.0)))
  }

  test("repetition_stats: native WordStats == fold twin on tokenization edge cases") {
    import s.implicits._
    val docs = Seq(
      (0L, "a b a b a"),       // bigram dups: "a b"×2, "b a"×2
      (1L, "a  b"),            // double space → empty middle token
      (2L, "a b "),            // trailing space → trailing empty token
      (3L, "solo"),            // one word, zero bigrams
      (4L, ""),                // empty text → one empty token
      (5L, "x x x x x x"))     // top_word_frac 1.0
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    val native = run(TextOps.repetitionStatsDocs(docs))
    val fold = run(TextOps.repetitionStatsDocsFold(docs))
    assert(native == fold)
    // closed forms: doc 0 has 5 words {a:3,b:2}, 4 bigrams, 2 distinct
    assert(native(0L).take(4) == Seq(5L, 2L, 4L, 3L))
    assert(native(3L).take(4) == Seq(1L, 1L, 0L, 1L))
    assert(native(4L).take(4) == Seq(1L, 1L, 0L, 1L))
  }

  test("char_diversity: run-length fold == explode-groupBy recompute on real docs") {
    val got = TextOps.charDiversity(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("distinct_chars"), r.getAs[Double]("simpson"))))
      .toMap
    val expect = Tables.documents(s, sf)
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("r"))
      .groupBy("doc_id").agg(sum(col("r") * col("r")).as("sumsq"),
        sum(col("r")).as("n"), count(lit(1)).as("dc"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("dc"),
          1.0 - r.getAs[Long]("sumsq").toDouble /
            (r.getAs[Long]("n") * r.getAs[Long]("n")).toDouble)))
      .toMap
    assert(got == expect)
  }
}
