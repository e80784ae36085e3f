package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, TextOps}

/** Long-document robustness sweep: a 100 TB corpus WILL contain 10⁵-word
  * and 10⁷-char documents, and the text/dedup family must stay near-linear
  * on them — the operators that screen pathological documents cannot
  * themselves be quadratic in document length (the round-4 verdict found
  * exactly that in repetition_stats' old nested count lambda: ~10¹²
  * comparisons on the all-distinct 10⁷-char doc below; the run-length
  * rewrite is ~10⁶).
  *
  * Each op gets a generous wall ceiling — the point is catching O(L²)
  * (hours), not benchmarking (a contended box inflates constants 4–40×,
  * round-4 verdict), so the ceiling only fails on complexity blowups. */
class LongDocSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  // Quadratic forms take HOURS on these docs; the slowest legitimate
  // block (the fold twins, ~8–22 s quiet) must clear the ceiling even
  // under the 4–40× contention inflation the round-4 verdict measured
  // on this box — 300 s keeps ~14× headroom without masking an O(L²).
  val Ceiling = 300.0

  // doc 1: 100k words as a 50-word cycle — every bigram duplicated
  // (dup_bigram_frac → 1), the looping-generator shape the Gopher gate
  // flags; uniq×words = 5M comparisons under a quadratic top-word count
  private val cycle = (0 until 50).map(i => s"tok$i").mkString(" ")
  private def doc1 = Seq.fill(2000)(cycle).mkString(" ")
  // doc 2: ~10⁷ chars of ALL-DISTINCT words — uniq ≈ L ≈ 1.2M, the true
  // worst case for any O(uniq·L) per-document lambda
  private def doc2 = (0 until 1200000).map(i => s"w$i").mkString(" ")
  // doc 3: one word repeated 100k times — top_word_frac = 1.0
  private def doc3 = Seq.fill(100000)("spam").mkString(" ")
  // all-distinct words: top_word_frac 1/20 and zero duplicate bigrams,
  // safely inside both gates (a "the ... the" sentence legitimately trips
  // the 0.1 top-word gate at 9 words)
  private val doc4 = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliett kilo lima mike november oscar papa quebec romeo sierra tango"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-longdoc").toString
    val rows = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4))
    import s.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"$label: $sec%.1f s")
    assert(sec < Ceiling, f"$label took $sec%.1f s — complexity blowup on long docs")
    r
  }

  test("repetition gates stay near-linear and still flag the pathological docs") {
    // untimed warmup on the small control doc: the FIRST Spark action of
    // a cold suite pays session init + codegen + JIT (~10 s), which would
    // otherwise charge whichever formulation happens to run first
    val tiny = Tables.documents(s, dir).where(col("doc_id") === 4L)
    TextOps.repetitionStatsDocs(tiny).collect()
    TextOps.repetitionStatsDocsFold(tiny).collect()
    val rows = timed("repetition_stats_native") {
      TextOps.repetitionStats(s, dir).collect()
    }
    val foldRows = timed("repetition_stats_fold_twin") {
      TextOps.repetitionStatsDocsFold(Tables.documents(s, dir)).collect()
    }
    assert(rows.map(_.toSeq).toSeq == foldRows.map(_.toSeq).toSeq,
      "native WordStats must reproduce the fold formulation on the monster docs")
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId(1L).getAs[Boolean]("keep"), "cycled doc must fail the bigram gate")
    assert(byId(1L).getAs[Double]("dup_bigram_frac") > 0.9)
    assert(byId(1L).getAs[Long]("top_word_n") == 2000L)
    assert(byId(2L).getAs[Double]("top_word_frac") < 0.001, "all-distinct doc")
    assert(!byId(3L).getAs[Boolean]("keep"), "single-word doc must fail the top-word gate")
    assert(byId(3L).getAs[Double]("top_word_frac") == 1.0)
    assert(byId(3L).getAs[Long]("top_word_n") == 100000L)
    assert(byId(4L).getAs[Boolean]("keep"), "control doc must pass")
  }

  test("tokens, winnow, minhash, simhash, chunking survive the long docs") {
    val docs = Tables.documents(s, dir)
    timed("text_tokens") {
      val n = TextOps.textTokens(s, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ws_tokens")).toMap
      assert(n(2L) == 1200000L, s"10⁷-char doc tokenized: ${n(2L)}")
    }
    timed("text_winnow") {
      // fingerprint density ~2/(w+1); the guarantee spec covers semantics —
      // here just force full evaluation over the monster docs
      assert(TextOps.winnowDocs(docs).groupBy("doc_id").count().collect()
        .map(r => r.getAs[Long]("count")).sum > 0)
    }
    timed("minhash_signatures") {
      val sigs = DedupOps.minhashSignatures(docs).collect()
      assert(sigs.length == 4 && sigs.forall(_.getAs[Seq[Long]]("sig").length == DedupOps.MinhashK))
    }
    timed("simhash_signatures") {
      assert(DedupOps.simhashSignatures(docs).collect().length == 4)
    }
    timed("doc_chunk") {
      val chunks = TextOps.docChunk(s, dir).groupBy("doc_id").count().collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
      // ceil(10⁷-ish chars / 150-stride) chunks for the monster doc
      assert(chunks(2L) > 50000L, s"chunk count ${chunks(2L)}")
    }
    timed("char_diversity_native") {
      // native CharStats: ONE O(L) codegen pass — the 10⁷-char doc is
      // where the interpreted fold twin pays ~20 s (see next block)
      val rows = TextOps.charDiversity(s, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("eff_chars")))).toMap
      assert(rows(2L)._1 > 9000000L, "monster doc char count")
      assert(rows(2L)._2 > 10.0, "all-distinct words → high char diversity")
    }
    timed("char_diversity_fold_twin") {
      // the functions._-only formulation stays under the ceiling (it is
      // O(L log L), not O(L²)) but records the native expression's win
      assert(TextOps.charDiversityDocsFold(docs).collect().length == 4)
    }
    timed("rare_token_stats") {
      // the explode → vocab agg → join-back pipeline on ~2.5M exploded
      // tokens (1.2M of them distinct): shuffle-heavy but strictly linear
      val rt = TextOps.rareTokenStats(s, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rare_frac")).toMap
      assert(rt(2L) > 0.99, "the all-distinct doc is almost entirely corpus-rare")
      assert(rt(3L) < 0.01, "the single-word doc has zero rare tokens")
    }
    timed("text_tfidf") {
      // explode → two partial-agg groupBys → term equi-join → per-doc
      // top-k window; the 1.2M all-distinct terms of doc 2 are the df=1
      // worst case, and its doc_id window partition sorts 1.2M rows in
      // one task (bounded by the longest DOCUMENT, not the corpus)
      val tf = TextOps.textTfidf(s, dir).collect()
      val byDoc = tf.groupBy(_.getAs[Long]("doc_id"))
      assert(byDoc.keySet == Set(1L, 2L, 3L, 4L))
      assert(tf.forall(_.getAs[Long]("rnk") <= 3L))
      // all of doc 2's terms are unique to it: df=1, tf=1 → tfidf = N
      assert(byDoc(2L).forall(r => r.getAs[Long]("df") == 1L &&
        r.getAs[Double]("tfidf") == 4.0))
    }
    timed("ngram_counts") {
      // bigram explode (the wordGrams path that hid the round-5 O(L²))
      // → one partial-agg shuffle over ~2.5M bigrams, 1.2M distinct
      val top = TextOps.ngramCounts(s, dir).collect()
      assert(top.length == 100)
      val head = top.head
      assert(head.getAs[String]("ngram") == "spam spam" &&
        head.getAs[Long]("n_total") == 99999L,
        s"top bigram ${head}")
      // the 50-word cycle's bigrams each occur ~2000 times and fill the
      // rest of the top-100
      assert(top.drop(1).take(10).forall(_.getAs[Long]("n_total") >= 1999L))
    }
    timed("repeated_spans") {
      // the (gram,doc) collapse is the guard: doc 1's 100k occurrences of
      // 50 distinct 5-grams collapse to 50 rows, doc 2's 1.2M all-distinct
      // grams stay 1-per-row — both linear; a doc-5 clone of doc 4 pins
      // the cross-doc dup semantics at full span coverage
      import s.implicits._
      val withClone = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
        .unionByName(Seq((5L, doc4)).toDF("doc_id", "text"))
      val rs = TextOps.repeatedSpansDocs(withClone).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Double]("dup_frac")))).toMap
      assert(rs(1L)._2 == 0.0 && rs(2L)._2 == 0.0 && rs(3L)._2 == 0.0,
        "intra-doc repetition is NOT cross-doc duplication")
      assert(rs(4L) == ((16L, 1.0)) && rs(5L) == ((16L, 1.0)),
        s"cloned doc must be fully span-duplicated: ${rs(4L)} / ${rs(5L)}")
      assert(rs(2L)._1 == 1199996L, "all-distinct doc span count")
    }
    timed("span_scrub") {
      // worst cases meet: doc 2's 1.2M kept words re-sort in ONE group
      // (bounded by the longest doc), and clones 4/5 drive the covered-
      // position explode; the monsters stay unique so survive whole
      import s.implicits._
      val withClone = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
        .unionByName(Seq((5L, doc4)).toDF("doc_id", "text"))
      val sc = TextOps.spanScrubDocs(withClone).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
      assert(sc(2L) == 0L && sc(1L) == 0L && sc(3L) == 0L,
        "unique monsters survive scrubbing whole")
      assert(sc(4L) == 20L && sc(5L) == 20L, "clones scrub to empty")
    }
    timed("gopher_gates") {
      // per-token rlike + per-line lambdas are interpreted but O(L) —
      // the monster docs prove no hidden quadratic
      val g = TextOps.gopherGates(s, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
      assert(g.size == 4)
      assert(g(4L), "the clean-prose control doc passes")
    }
  }

  test("round-8 text ops survive the long docs") {
    import graft.operators.{DedupOps, TextOps}
    timed("doc_embed") {
      // one hash + one shuffle row per token — O(L) per doc; the 1.2M
      // distinct-word doc is the worst case for the explode volume
      val rows = TextOps.docEmbed(s, dir).collect()
      assert(rows.length == 4)
      // mass invariant: Σ|f_i| bounded by the token count of doc 1
      val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
      val massSum = (0 until TextOps.EmbedDims)
        .map(i => math.abs(r1.getAs[Long](s"f$i"))).sum
      assert(massSum <= 100000L)
    }
    timed("quality_model_score") {
      // pure per-row projection — must be scan-bound on 10⁷ chars
      val q = TextOps.qualityModelScore(s, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
      assert(q.size == 4)
    }
    timed("dedup_containment") {
      // doc 1 is a 50-word cycle: its distinct shingles ≈ 50 whatever
      // its length, so posting lists stay bounded; no pair should fire
      // between the all-distinct monsters
      val c = DedupOps.dedupContainment(s, dir).collect()
      assert(c.forall(r =>
        r.getAs[Double]("containment") >= DedupOps.ContainmentThreshold))
    }
    s.catalog.clearCache()
  }
}
