package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** Round-9 keyed operators beyond the AnnIndex family (which has its own
  * spec): the text→vector→semantic-dedup loop. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("key skew job: landing two days and diffing pages on the drifted key") {
    val base = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val events = Tables.eventsUs(s, sf)
    // day 1: organic distribution; day 2: one user goes hot (its rows
    // replicated 5× — the drifting-join-key incident this panel exists
    // to catch before a stage wedges)
    val hotUser = events.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).limit(1)
      .collect()(0).getAs[Long]("user_id")
    val hot = events.filter(col("user_id") === hotUser)
    val day2 = events.unionByName(hot).unionByName(hot)
      .unionByName(hot).unionByName(hot)
    Jobs.runKeySkewJob(s, events, "user_id", base, "2024-01-01")
    Jobs.runKeySkewJob(s, day2, "user_id", base, "2024-01-02")
    val drift = Jobs.keySkewDrift(s, base, "user_id", "2024-01-01", "2024-01-02")
      .collect()
    s.catalog.clearCache()
    assert(drift.nonEmpty)
    // the pager line: row 1 is the planted hot key, with a positive delta
    val top = drift.head
    assert(top.getAs[Long]("key") == hotUser,
      s"top drift row is ${top.getAs[Long]("key")}, expected planted $hotUser")
    assert(top.getAs[Double]("skew_delta") > 0.0)
    assert(drift.forall(r => Set("entered", "left", "stayed")(r.getAs[String]("status"))))
    // the same parameterized core runs on any (table, key) pair
    val byPart = graft.operators.QualityOps.keySkewOf(
      Tables.lineitem(s, sf), "l_partkey", 5).collect()
    assert(byPart.length == 5 && byPart.forall(_.getAs[Double]("skew_x") >= 1.0))
    s.catalog.clearCache()
  }

  test("chunk_neighbors: k per query chunk, cross-doc only, descending, scores valid") {
    import graft.operators.TextOps
    val out = TextOps.chunkNeighbors(s, sf).collect()
    s.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("q_doc") != r.getAs[Long]("n_doc"),
        "same-doc chunk must never be a neighbor")
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    out.groupBy(r => (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk")))
      .foreach { case (_, rows) =>
        assert(rows.length <= 5)
        val byRank = rows.sortBy(_.getAs[Long]("rnk"))
        assert(byRank.map(_.getAs[Long]("rnk")).toSeq ==
          (1L to rows.length).toSeq, "ranks must be dense from 1")
        val sims = byRank.map(_.getAs[Double]("cos_sim"))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
          "cos_sim must be non-increasing in rank")
      }
  }

  test("dedup_report: every leg recomputes from its standalone key") {
    import graft.operators.DedupOps
    val panel = DedupOps.dedupReport(s, sf).collect()
      .map(r => r.getAs[String]("space") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"),
          r.getAs[Double]("flagged_rate")))).toMap
    s.catalog.clearCache()
    val nDocs = Tables.documents(s, sf).count()
    assert(panel.keySet == Set("exact", "normalized", "near_dup_jaccard", "semantic_text"))
    panel.values.foreach { case (n, f, r) =>
      assert(n == nDocs && f >= 0 && f <= n)
      assert(math.abs(r - f.toDouble / n) < 1e-15)
    }
    // exact ≤ normalized (canonicalization only merges hash groups)
    assert(panel("exact")._2 <= panel("normalized")._2)
    // legs recompute from the standalone keys
    val jacFlagged = DedupOps.dedupNgramJaccard(s, sf)
      .select("doc_b").distinct().count()
    s.catalog.clearCache()
    assert(panel("near_dup_jaccard")._2 == jacFlagged)
    val semFlagged = graft.operators.ClusterOps.semanticDedupText(s, sf)
      .filter(!col("keep")).count()
    s.catalog.clearCache()
    assert(panel("semantic_text")._2 == semFlagged)
  }

  test("chunk_embed: chunk vectors sum consistently with chunk coverage") {
    import graft.operators.TextOps
    val ce = TextOps.chunkEmbed(s, sf).collect()
    s.catalog.clearCache()
    val chunks = TextOps.docChunk(s, sf).select("doc_id", "chunk_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"))).toSet
    s.catalog.clearCache()
    // one vector per chunk, exactly the doc_chunk coverage
    assert(ce.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"))).toSet
      == chunks)
    // a full-coverage sanity: a doc's FIRST chunk over its own full text
    // prefix must reproduce hashing that text prefix directly
    val doc = Tables.documents(s, sf).select("doc_id", "text")
      .filter(length(col("text")) <= TextOps.ChunkSize)
      .orderBy("doc_id").limit(1).collect()(0)
    val id = doc.getAs[Number]("doc_id").longValue
    val whole = ce.filter(r => r.getAs[Long]("doc_id") == id)
    assert(whole.length == 1, "short doc must be exactly one chunk")
    val fromDocEmbed = TextOps.docEmbed(s, sf)
      .filter(col("doc_id") === id).collect()(0)
    s.catalog.clearCache()
    (0 until TextOps.EmbedDims).foreach { i =>
      assert(whole(0).getAs[Long](s"f$i") == fromDocEmbed.getAs[Long](s"f$i"),
        s"dim $i of single-chunk doc $id diverges from doc_embed")
    }
  }

  test("bpe_fertility: per-source ratios recompute from the per-doc token frame") {
    import graft.operators.TokenizerOps
    val panel = TokenizerOps.bpeFertility(s, sf).collect()
    s.catalog.clearCache()
    val perDoc = TokenizerOps.bpeTokens(s, sf)
      .join(Tables.documents(s, sf).select("doc_id", "source"), "doc_id")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens")))
    s.catalog.clearCache()
    assert(panel.nonEmpty && panel.length ==
      perDoc.map(_._1).distinct.length, "one row per source")
    panel.foreach { r =>
      val src = r.getAs[String]("source")
      val rows = perDoc.filter(_._1 == src)
      assert(r.getAs[Long]("n_words") == rows.map(_._2).sum)
      assert(r.getAs[Long]("n_tokens") == rows.map(_._3).sum)
      val fert = r.getAs[Double]("fertility")
      assert(fert >= 1.0, f"fertility $fert%.3f < 1 — a word encodes to ≥1 token")
      assert(math.abs(fert - rows.map(_._3).sum.toDouble / rows.map(_._2).sum) < 1e-12)
    }
  }

  test("semantic_dedup_text: verdicts cover every non-zero-norm doc with first-wins semantics") {
    val out = ClusterOps.semanticDedupText(s, sf).collect()
    s.catalog.clearCache()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate verdict rows")
    // first-wins: a blocker is always an EARLIER doc; keep == no blocker
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dup = Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue)
      assert(r.getAs[Boolean]("keep") == dup.isEmpty)
      dup.foreach(d => assert(d < id, s"blocker $d not earlier than $id"))
    }
    // blockers must sit in the blocked doc's own cluster (the SemDeDup
    // within-cluster contract)
    val cl = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    out.foreach { r =>
      Option(r.getAs[java.lang.Long]("dup_of")).foreach { d =>
        assert(cl(d.longValue) == r.getAs[Long]("cluster"),
          s"dup_of ${d} in another cluster than ${r.getAs[Long]("doc_id")}")
      }
    }
    // the doc corpus contains near-identical template docs — the loop
    // must actually catch some (non-degenerate at the 0.35 threshold)
    assert(out.count(!_.getAs[Boolean]("keep")) > 0, "no dups flagged — degenerate")
  }

  test("pack_sequences_bpe: gapless in-shard layout over LEARNED token counts") {
    import graft.operators.CurationOps
    val p = CurationOps.packSequencesBpe(s, sf).cache()
    assert(p.count() > 0)
    assert(p.filter(col("seq_offset") >= CurationOps.PackBudget).count() == 0)
    assert(p.filter(col("n_splits") < 1).count() == 0)
    // gapless concat-and-split on the BPE-counted frame: each doc starts
    // exactly where the previous doc in its shard ended
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")
    val cum = p.withColumn("start", col("seq_id") * CurationOps.PackBudget + col("seq_offset"))
      .withColumn("prev_end", lag(col("start") + col("n_tokens"), 1).over(w))
    assert(cum.filter(col("prev_end").isNotNull && col("start") =!= col("prev_end"))
      .count() == 0, "BPE-counted packing must be gapless")
    // the seam this key closes: BPE counts exceed whitespace counts
    // (multi-token words), so the whitespace-budgeted layout under-packs
    val ws = CurationOps.packSequences(s, sf)
      .select(col("doc_id"), col("n_tokens").as("ws_tokens"))
    val joined = p.join(ws, "doc_id")
    assert(joined.filter(col("n_tokens") < col("ws_tokens")).count() == 0,
      "a word can never encode to fewer than one token")
    assert(joined.filter(col("n_tokens") > col("ws_tokens")).count() > 0,
      "BPE counts should exceed whitespace counts somewhere")
    p.unpersist()
    s.catalog.clearCache()
  }

  test("semantic_dedup_text: flagged pairs really clear the cosine threshold on recomputation") {
    val out = ClusterOps.semanticDedupText(s, sf)
      .filter(col("dup_of").isNotNull).limit(20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))
    s.catalog.clearCache()
    assert(out.nonEmpty)
    // recompute hashed vectors independently (same construction as the
    // operator's bridge, but via the keyed doc_embed output)
    val f = graft.operators.TextOps.docEmbed(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until graft.operators.TextOps.EmbedDims).map(i => r.getAs[Long](s"f$i")).toArray)
      .toMap
    s.catalog.clearCache()
    out.foreach { case (a, b) =>
      val (va, vb) = (f(a), f(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum.toDouble
      val cos = dot / (math.sqrt(va.map(x => x * x).sum.toDouble) *
        math.sqrt(vb.map(x => x * x).sum.toDouble))
      assert(cos >= ClusterOps.SemThreshold - 1e-12,
        f"flagged pair ($a,$b) has cos=$cos%.4f < threshold")
    }
  }

  test("bigram_lm_score: planted MLE probabilities, certainty self-loop, <2-token docs absent") {
    import s.implicits._
    // corpus transitions from 'a': a→b twice, a→c once ⇒ p(b|a)=⌊2e6/3⌋,
    // p(c|a)=⌊1e6/3⌋; "x x x" is a certainty loop ⇒ p(x|x)=1e6 exactly
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "x x x"),
      (5L, "solo"), (6L, "")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextOps.bigramLmScoreDocs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_e6"), r.getAs[Long]("min_p_e6")))
      .toMap
    s.catalog.clearCache()
    assert(!out.contains(5L) && !out.contains(6L),
      "docs with <2 tokens have no transitions and must be absent")
    assert(out(1L) == ((1L, 666666L, 666666L)))
    assert(out(2L) == ((1L, 666666L, 666666L)))
    assert(out(3L) == ((1L, 333333L, 333333L)))
    assert(out(4L) == ((2L, 1000000L, 1000000L)),
      "a repeated token is the model's only continuation: probability 1")
  }

  test("bigram_lm_score (sf): transition distributions sum to the prefix mass; scores bounded") {
    val out = graft.operators.TextOps.bigramLmScore(s, sf).collect()
    s.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lm = r.getAs[Long]("lm_e6"); val mn = r.getAs[Long]("min_p_e6")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      assert(mn >= 0L && mn <= 1000000L && lm >= mn && lm <= 1000000L,
        "the mean transition probability is bounded by [min_p, 1]")
    }
    // the distribution property the scaladoc claims: for every prefix,
    // transition counts sum exactly to the prefix mass (recomputed here
    // independently of the operator)
    import org.apache.spark.sql.functions._
    val bg = Tables.documents(s, sf)
      .select(explode(graft.operators.DedupOps.wordGrams(col("text"), 2)).as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("w1"), col("bigram"))
    val chk = bg.groupBy("w1", "bigram").agg(count(lit(1)).as("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("fanout"))
      .agg(sum(col("c1")).as("mass"), sum(col("fanout")).as("types")).head()
    val total = bg.count()
    s.catalog.clearCache()
    assert(chk.getAs[Long]("mass") == total,
      "Σ_w1 c1(w1) must equal the corpus transition count exactly")
  }
}
