package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SimilarityOps, TokenizerOps}

/** Round-8 operators: JL random projection and the trained BPE
  * tokenizer. The BPE reference implementation here is written
  * independently of graft.functions.Bpe (plain Maps and Vectors, no
  * shared kernels) so the distributed trainer is checked against a
  * second derivation of the same conventions: overlapping adjacency
  * counts, lexicographic tie-break, left-to-right non-overlapping merge
  * application. */
class Round8OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("embedding_project: exact DotE12 recompute, all-integer output") {
    val out = SimilarityOps.embeddingProject(s, sf).collect()
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding").toArray).toMap
    assert(out.length == emb.size)
    val planes = SimilarityOps.projPlanes(8)
    out.take(50).foreach { r =>
      val e = emb(r.getAs[Long]("vec_id"))
      for (i <- 0 until 8) {
        val expected = e.zip(planes(i)).map { case (x, w) =>
          math.floor(x.toDouble * w.toDouble * 1e12 + 0.5).toLong }.sum
        assert(r.getAs[Long](s"p$i") == expected,
          s"vec ${r.getAs[Long]("vec_id")} plane $i")
      }
    }
  }

  // ---------- independent BPE reference ----------

  private def refMergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merges, final segmentation) from a word-frequency map. */
  private def refTrain(freq: Map[String, Long], n: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var seg = freq.map { case (w, c) => w -> w.map(_.toString).toVector }
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var round = 0
    while (round < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + freq(w)
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, f))
        seg = seg.map { case (w, syms) => w -> refMergeOnce(syms, l, r) }
        round += 1
      }
    }
    (merges.result(), seg)
  }

  test("bpe_merges: matches an independent in-memory BPE on the Sennrich corpus") {
    import s.implicits._
    // the BPE paper's worked corpus: low×5 lower×2 newest×6 widest×3
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = freq.toSeq.sortBy(_._1).flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TokenizerOps.bpeTrain(docs, 8)
    val (exp, finalSeg) = refTrain(freq, 8)
    assert(got.map { case (_, l, r, f) => (l, r, f) } == exp,
      s"merge sequence diverged:\n got=$got\n exp=$exp")
    // the first two merges of the classic corpus are famously e+s then es+t
    assert(exp.take(2).map(m => (m._1, m._2)) == Seq(("e", "s"), ("es", "t")))
    // encode-by-fold reproduces the training segmentation for every word
    val merges = got.map { case (_, l, r, _) => (l, r) }
    freq.keys.foreach { w =>
      assert(graft.functions.Bpe.encodeWord(w, merges.toArray).toVector
        == finalSeg(w), s"encode($w) diverged from training segmentation")
    }
  }

  test("bpe_merges on sf data: valid ranks, positive freqs, tokens concatenate") {
    val rows = TokenizerOps.bpeMerges(s, sf).collect()
    assert(rows.length == TokenizerOps.NumMerges)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("rank") == i)
      assert(r.getAs[Long]("freq") > 0)
      assert(r.getAs[String]("token") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
    }
    // merges must actually be learned FROM this corpus: every merged
    // token appears as a substring of some document
    val texts = Tables.documents(s, sf).select("text").collect()
      .map(_.getString(0))
    rows.foreach { r =>
      val tok = r.getAs[String]("token")
      assert(texts.exists(_.contains(tok)), s"token '$tok' not in any document")
    }
    s.catalog.clearCache()
  }

  test("bpe_tokens: bounds, fold-consistency with the learned merges, determinism") {
    val toks = TokenizerOps.bpeTokens(s, sf).collect()
    val docs = Tables.documents(s, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_chars")))).toMap
    assert(toks.length == docs.size)
    val merges = TokenizerOps.bpeMerges(s, sf).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    toks.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val words = docs(id)._1.split(" ").filter(_.nonEmpty)
      val nw = r.getAs[Long]("n_words")
      val nt = r.getAs[Long]("n_tokens")
      assert(nw == words.length, s"doc $id word count")
      assert(nt >= nw, s"doc $id: every word is >= 1 token")
      // exact recompute through the shared kernel on a sample
      if (id % 37 == 0) {
        val expect = words.map(w =>
          graft.functions.Bpe.encodeWord(w, merges).length.toLong).sum
        assert(nt == expect, s"doc $id token count != per-word fold")
      }
    }
    s.catalog.clearCache()
  }
}
