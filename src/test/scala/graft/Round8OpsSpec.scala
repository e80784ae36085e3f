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

  // ---------- exact k-means + SemDeDup + quality model ----------

  /** Collected (vec_id → e6-quantized components), the integer domain
    * ClusterOps computes in. */
  private def e6Vectors(): Map[Long, Array[Long]] =
    Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Independent in-memory Lloyd reference (same init / argmin /
    * round-half-up update conventions, plain Scala collections): trains
    * on `train` ⊆ v, returns the final-centroid assignment of ALL of
    * `v` as id → (cluster, dist2). */
  private def refLloyd(v: Map[Long, Array[Long]], train: Map[Long, Array[Long]],
      k: Int, rounds: Int): Map[Long, (Long, Long)] = {
    var cent: Map[Long, Array[Long]] =
      (0L until k.toLong).map(c => c -> train(c)).toMap
    def assignOver(m: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      m.map { case (id, x) =>
        val (d, c) = cent.toSeq.map { case (cc, cv) => (d2(x, cv), cc) }.min
        id -> (c, d)
      }
    for (_ <- 1 to rounds) {
      val a = assignOver(train)
      val byC = train.toSeq.groupBy { case (id, _) => a(id)._1 }
      cent = cent.map { case (c, old) =>
        c -> byC.get(c).map { mem =>
          val n = mem.size
          old.indices.map { i =>
            math.floor(mem.map(_._2(i)).sum.toDouble / n + 0.5).toLong
          }.toArray
        }.getOrElse(old)
      }
    }
    assignOver(v)
  }

  test("embedding_kmeans: matches an independent in-memory Lloyd run") {
    import graft.operators.ClusterOps
    val v = e6Vectors()
    val expect = refLloyd(v, v, ClusterOps.KmeansK, ClusterOps.KmeansRounds)
    val out = ClusterOps.embeddingKmeans(s, sf).collect()
    assert(out.length == v.size)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert((r.getAs[Long]("cluster"), r.getAs[Long]("dist2")) == expect(id),
        s"vec $id")
    }
    // non-degenerate: every cluster captured someone
    assert(out.map(_.getAs[Long]("cluster")).distinct.length == ClusterOps.KmeansK)
    s.catalog.clearCache()
  }

  test("embedding_pq: per-subspace codes + exact reconstruction error match an in-memory PQ") {
    import graft.operators.ClusterOps
    // the PQ domain is the NORMALIZED quantization: e6 ints of the unit
    // vector, x·10¹²/√nrmE12 (mirroring ClusterOps.quantized normalize)
    val v = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getAs[collection.Seq[Float]]("embedding").toArray
        val nrm = e.map(x => math.floor(x.toDouble * x.toDouble * 1e12 + 0.5).toLong).sum
        r.getAs[Long]("vec_id") -> e.map(x =>
          math.floor(x.toDouble * 1e12 / math.sqrt(nrm.toDouble) + 0.5).toLong)
      }.toMap
    val dimsPer = 64 / ClusterOps.PqM
    // per-subspace reference Lloyd on the sliced vectors
    val subAssign = (0 until ClusterOps.PqM).map { m =>
      val sl = v.map { case (id, x) =>
        id -> x.slice(m * dimsPer, (m + 1) * dimsPer) }
      refLloyd(sl, sl, ClusterOps.PqK, ClusterOps.PqRounds)
    }
    val out = ClusterOps.embeddingPq(s, sf).collect()
    s.catalog.clearCache()
    assert(out.length == v.size)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      var err = 0L
      for (m <- 0 until ClusterOps.PqM) {
        val (c, d) = subAssign(m)(id)
        assert(r.getAs[Long](s"c$m") == c, s"vec $id code $m")
        assert(c >= 0 && c < ClusterOps.PqK)
        err += d
      }
      assert(r.getAs[Long]("err") == err, s"vec $id err")
    }
    // compression is non-degenerate: multiple distinct code words in use
    val words = out.map(r => (0 until ClusterOps.PqM)
      .map(m => r.getAs[Long](s"c$m")).toList).distinct
    assert(words.length > ClusterOps.PqK, s"code diversity: ${words.length}")
  }

  test("ann_ivf_pq: cell-pruned ADC agrees with the flat scan on surviving pairs") {
    import graft.operators.ClusterOps
    // flat ADC ground truth for pair scores
    val flat = ClusterOps.annPq(s, sf, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Long]("adist")).toMap
    s.catalog.clearCache()
    val ivf = ClusterOps.annIvfPq(s, sf).collect()
    s.catalog.clearCache()
    assert(ivf.nonEmpty)
    // every pruned-scan score must equal the flat ADC score — the coarse
    // stage may only FILTER candidates, never change arithmetic
    ivf.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      assert(flat(key) == r.getAs[Long]("adist"), s"pair $key adist")
    }
    // pruning is real: recompute coarse cells in memory, check each
    // result lives in one of its query's nprobe probed cells and that
    // probed cells cover < the whole corpus
    val v = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getAs[collection.Seq[Float]]("embedding").toArray
        val nrm = e.map(x => math.floor(x.toDouble * x.toDouble * 1e12 + 0.5).toLong).sum
        r.getAs[Long]("vec_id") -> e.map(x =>
          math.floor(x.toDouble * 1e12 / math.sqrt(nrm.toDouble) + 0.5).toLong)
      }.toMap
    // coarse training: refLloyd has rounds assignments + updates; the
    // operator's cell = argmin vs the FINAL centroids — refLloyd returns
    // exactly that
    val cellAssign = refLloyd(v, v, ClusterOps.CoarseCells, ClusterOps.CoarseRounds)
    // probed cells per query: nprobe nearest final centroids — recompute
    // via distances to centroids reconstructed from the assignment? The
    // operator output is the check: every n_id's cell must be among the
    // distinct cells its query's results occupy, and that set is ≤ nprobe.
    val byQ = ivf.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rows) =>
      val cells = rows.map(r => cellAssign(r.getAs[Long]("n_id"))._1).distinct
      assert(cells.length <= ClusterOps.PqNprobe, s"query $q spans cells $cells")
    }
    // candidate universe strictly smaller than the corpus (cells > nprobe
    // and non-degenerate cell sizes)
    val cellSizes = cellAssign.values.groupBy(_._1).map(_._2.size)
    assert(cellSizes.size > ClusterOps.PqNprobe,
      s"coarse quantizer collapsed: ${cellSizes.size} cells in use")
  }

  test("semantic_dedup: verdicts recompute from clusters + exact cosine; kept set is pairwise-clean") {
    import graft.operators.ClusterOps
    val out = ClusterOps.semanticDedup(s, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        r.getAs[Boolean]("keep")))
    s.catalog.clearCache()
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding").toArray).toMap
    def dotE12(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong }.sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotE12(a, b).toDouble /
        (math.sqrt(dotE12(a, a).toDouble) * math.sqrt(dotE12(b, b).toDouble))
    val cluster = out.map(t => t._1 -> t._2).toMap
    // per-doc verdict: dup_of == the LOWEST same-cluster lower id above τ
    out.foreach { case (id, c, dupOf, keep) =>
      val expected = out.collect {
        case (o, oc, _, _) if oc == c && o < id &&
          cos(emb(o), emb(id)) >= ClusterOps.SemThreshold => o
      }.sorted.headOption
      assert(dupOf == expected, s"vec $id")
      assert(keep == expected.isEmpty, s"vec $id keep")
    }
    // the curation guarantee: the KEPT set contains no same-cluster
    // near-dup pair (first-wins greedy closes over the whole cluster)
    val kept = out.filter(_._4).map(_._1)
    for (a <- kept; b <- kept if a < b && cluster(a) == cluster(b))
      assert(cos(emb(a), emb(b)) < ClusterOps.SemThreshold, s"pair ($a,$b)")
    // non-degenerate on this corpus: some dups found, most docs kept
    assert(kept.length < out.length && kept.length > out.length / 2)
  }

  test("semantic_dedup_incremental: frozen-quantizer verdicts recompute; corpus never blocks on itself") {
    import graft.operators.ClusterOps
    val out = ClusterOps.semanticDedupIncremental(s, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("dup_in_batch"),
        r.getAs[Boolean]("keep")))
    s.catalog.clearCache()
    val v = e6Vectors()
    val train = v.filter { case (id, _) => id < ClusterOps.SemSplit }
    val assign = refLloyd(v, train, ClusterOps.KmeansK, ClusterOps.KmeansRounds)
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding").toArray).toMap
    def dotE12(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong }.sum
    def cos(a: Long, b: Long): Double =
      dotE12(emb(a), emb(b)).toDouble /
        (math.sqrt(dotE12(emb(a), emb(a)).toDouble) *
          math.sqrt(dotE12(emb(b), emb(b)).toDouble))
    // one row per batch doc, none for corpus docs
    val batchIds = v.keys.filter(_ >= ClusterOps.SemSplit).toSet
    assert(out.map(_._1).toSet == batchIds)
    out.foreach { case (id, c, dc, db, keep) =>
      assert(c == assign(id)._1, s"vec $id cluster")
      val near = (o: Long) => assign(o)._1 == c &&
        cos(o, id) >= ClusterOps.SemThreshold
      val expDc = v.keys.exists(o => o < ClusterOps.SemSplit && near(o))
      val expDb = batchIds.exists(o => o < id && near(o))
      assert(dc == expDc, s"vec $id dup_of_corpus")
      assert(db == expDb, s"vec $id dup_in_batch")
      assert(keep == (!expDc && !expDb), s"vec $id keep")
    }
    // non-degenerate: both verdict sources fire on this corpus
    assert(out.exists(_._3) && out.exists(_._5))
  }

  // ---------- streaming semantic admission ----------

  private def basis(p: Int): Seq[Float] =
    Seq.tabulate(64)(i => if (i == p) 1.0f else 0.0f)

  test("landSemanticAdmissionStream: cross-batch dup caught via the index; replay idempotent") {
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.ClusterOps
    import graft.streaming.EventStreams
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_admission").toString
    // frozen artifacts: 4 well-separated corpus vectors, one per cluster
    val corpus = Seq.tabulate(4)(i => (i.toLong, basis(i)))
      .toDF("vec_id", "embedding")
    ClusterOps.initSemanticIndex(corpus, dir)
    val in = MemoryStream[(Long, Seq[Float])](s)
    val q = EventStreams.landSemanticAdmissionStream(
      in.toDF().toDF("vec_id", "embedding"), dir)
    try {
      // 100 dups corpus vec 1; 101 novel; 102 dups 101 in-batch
      in.addData((100L, basis(1)), (101L, basis(10)), (102L, basis(10)))
      q.processAllAvailable()
      // 200 dups the ADMITTED 101 (via the forward-grown index); 201 novel
      in.addData((200L, basis(10)), (201L, basis(20)))
      q.processAllAvailable()
      val v = s.read.parquet(s"$dir/verdicts").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("dup_in_batch"),
            r.getAs[Boolean]("keep")))).toMap
      assert(v.size == 5, "one verdict per vector")
      assert(v(100L) == ((true, false, false)), "copy of corpus vec 1")
      assert(v(101L) == ((false, false, true)), "novel vector admitted")
      assert(v(102L) == ((false, true, false)), "in-batch dup of 101")
      assert(v(200L) == ((true, false, false)),
        "batch-2 copy of 101 must hit the index entry landed in batch 1")
      assert(v(201L) == ((false, false, true)))
      val indexed = s.read.parquet(s"$dir/index")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(indexed == Set(0L, 1L, 2L, 3L, 101L, 201L),
        "index = corpus + admitted only")
      // replay batch 0 directly: store must be unchanged
      val verdCount = s.read.parquet(s"$dir/verdicts").count()
      EventStreams.admitSemanticBatch(
        Seq((100L, basis(1)), (101L, basis(10)), (102L, basis(10)))
          .toDF("vec_id", "embedding"), 0L, dir, ClusterOps.SemThreshold)
      assert(s.read.parquet(s"$dir/verdicts").count() == verdCount,
        "replayed batch must not re-land verdicts")
      assert(s.read.parquet(s"$dir/index")
        .select("vec_id").collect().map(_.getLong(0)).toSet == indexed,
        "replayed batch must not re-append index rows")
    } finally q.stop()
    s.catalog.clearCache()
  }

  test("key_skew_report: ratios recompute from raw key counts; top-k is bounded") {
    import graft.operators.QualityOps
    val out = QualityOps.keySkewReport(s, sf).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val counts = Tables.eventsUs(s, sf).groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    val nKeys = counts.size.toLong
    val nRows = counts.values.sum
    // descending by count with key tiebreak; each ratio exact
    val expectTop = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
    out.zip(expectTop).foreach { case (r, (k, n)) =>
      assert(r.getAs[Long]("key") == k && r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("share") - n.toDouble / nRows) < 1e-15)
      assert(math.abs(r.getAs[Double]("skew_x") - n.toDouble * nKeys / nRows) < 1e-12)
    }
    // the HEAVIEST key is necessarily at or above the uniform average
    assert(out.head.getAs[Double]("skew_x") >= 1.0 - 1e-9)
    s.catalog.clearCache()
  }

  test("doc_embed: components recompute per token; sign parity and mass invariants hold") {
    import graft.operators.TextOps
    val out = TextOps.docEmbed(s, sf).collect()
    val docs = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == docs.size)
    // JVM-side recompute through the same XXH64 kernel Spark's xxhash64
    // uses (seed 42) — the INDEPENDENT check is the DuckDB oracle's
    // from-scratch HUGEINT emulation; this spec pins the dim/sign wiring
    def hashTok(t: String): Long = {
      val b = t.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          b.length, 42L)
    }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).split(" ", -1)
      val expect = Array.fill(TextOps.EmbedDims)(0L)
      toks.foreach { t =>
        val h = hashTok(t)
        val dim = java.lang.Long.remainderUnsigned(h, TextOps.EmbedDims.toLong).toInt
        val sg = if (((h >>> 4) & 1L) == 0L) 1L else -1L
        expect(dim) += sg
      }
      var sumAbs = 0L; var sum = 0L
      for (i <- 0 until TextOps.EmbedDims) {
        val f = r.getAs[Long](s"f$i")
        assert(f == expect(i), s"doc $id f$i")
        sumAbs += math.abs(f); sum += f
      }
      // each token contributes exactly ±1 somewhere
      assert(sumAbs <= toks.length)
      assert(((sum % 2) + 2) % 2 == toks.length % 2, s"doc $id parity")
    }
  }

  test("doc_neighbors: top-k recomputes from the doc_embed vectors") {
    import graft.operators.{SimilarityOps, TextOps}
    val emb = TextOps.docEmbed(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until TextOps.EmbedDims).map(i => r.getAs[Long](s"f$i")).toArray)
      .toMap
    val out = TextOps.docNeighbors(s, sf).collect()
    val nonzero = emb.filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble))
    val qs = nonzero.keys.filter(_ % SimilarityOps.QueryModulus == 0)
    assert(qs.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == qs.toSet)
    qs.foreach { q =>
      val expect = nonzero.keys.filter(_ != q).toSeq
        .map(n => (n, cos(emb(q), emb(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5)
      val got = byQ(q).sortBy(_.getAs[Long]("rnk"))
        .map(r => (r.getAs[Long]("n_id"), r.getAs[Double]("cos_sim")))
      assert(got.map(_._1).toSeq == expect.map(_._1), s"query $q neighbor order")
      got.zip(expect).foreach { case ((_, gc), (_, ec)) =>
        assert(math.abs(gc - ec) < 1e-12, s"query $q cos") }
    }
  }

  test("quality_model_score: logit recomputes from raw text; boundary splits the corpus") {
    import graft.operators.TextOps
    val out = graft.SparkEntry.queries("quality_model_score")(s, sf).collect()
    val docs = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == docs.size)
    out.take(100).foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val words = text.split(" ", -1)
      val stopN = words.count(TextOps.Stopwords("en").contains)
      val punctN = text.count(".,;:!?".contains(_))
      // [A-Za-z] as in the operator — ASCII letters, not Unicode isLetter
      val alphaN = words.count(_.exists(ch =>
        (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')))
      val charsN = math.max(text.length, 1)
      def e6(n: Long, d: Long) = math.floor(n.toDouble * 1e6 / d).toLong
      assert(r.getAs[Long]("stop_e6") == e6(stopN, words.length))
      assert(r.getAs[Long]("punct_e6") == e6(punctN, charsN))
      assert(r.getAs[Long]("alpha_e6") == e6(alphaN, words.length))
      assert(r.getAs[Long]("len_e6") ==
        math.min(words.length, TextOps.QmLenCap) * 2000L)
      val logit = TextOps.QmBiasE12 +
        r.getAs[Long]("stop_e6") * TextOps.QmWStop +
        r.getAs[Long]("punct_e6") * TextOps.QmWPunct +
        r.getAs[Long]("alpha_e6") * TextOps.QmWAlpha +
        r.getAs[Long]("len_e6") * TextOps.QmWLen
      assert(r.getAs[Long]("logit_e12") == logit)
      assert(r.getAs[Boolean]("keep") == (logit > 0))
    }
    // a useful filter separates: both classes present
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length)
  }
}
