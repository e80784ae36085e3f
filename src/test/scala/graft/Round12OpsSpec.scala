package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndexOps, ClusterOps, GraphOps}

/** Round 12: giant-component size annotation without a single-key
  * window, adaptive build-time cell sizing for the landed ANN index,
  * and the index-sourced kNN edge substrate for link prediction. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def freshDir(tag: String): String =
    graft.TempStores.scratchDir(s"graft_r12_$tag")

  test("componentPanel: size annotation is a partial-agg groupBy, not a component window") {
    // the executed plan must carry a hash-aggregate exchange on the
    // component key and NO window sort — at 100x the giant component
    // lands on one task under a partitionBy(component) window
    val plan = GraphOps.graphComponents(s, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "component_size must not be a window")
    assert(plan.contains("HashAggregate"), "size must be a partial-agg groupBy")
    s.catalog.clearCache()
  }

  test("adaptiveCells: exact rule boundaries, floored at CoarseCells") {
    val t = AnnIndexOps.CellOccupancyTarget
    assert(AnnIndexOps.adaptiveCells(1L) === ClusterOps.CoarseCells)
    assert(AnnIndexOps.adaptiveCells(t * ClusterOps.CoarseCells) === ClusterOps.CoarseCells)
    assert(AnnIndexOps.adaptiveCells(t * ClusterOps.CoarseCells + 1) === 2 * ClusterOps.CoarseCells)
    // every test corpus stays at the keyed cell count — the bit-identity
    // precondition for sharing ann_ivf_pq's oracle
    assert(AnnIndexOps.adaptiveCells(500L) === ClusterOps.CoarseCells)
    assert(AnnIndexOps.adaptiveCells(2000L) === ClusterOps.CoarseCells)
    // a billion-vector corpus sizes to ~2^18 cells of ~4k vectors each
    val big = AnnIndexOps.adaptiveCells(1000000000L)
    assert(big === (1 << 18))
    assert(t * big >= 1000000000L && t * (big / 2) < 1000000000L)
  }

  test("buildAnnIndex lands the sizing meta; stats panel surfaces it; oracle rule agrees") {
    val corpus = Tables.embeddings(s, sf).select("vec_id", "embedding")
    val dir = freshDir("meta")
    AnnIndexOps.buildAnnIndex(corpus, dir)
    s.catalog.clearCache()
    val meta = s.read.parquet(s"$dir/meta").collect()
    assert(meta.length === 1)
    val n = corpus.count()
    assert(meta.head.getAs[Long]("built_vecs") === n)
    assert(meta.head.getAs[Long]("cells") === AnnIndexOps.adaptiveCells(n).toLong)
    val panel = AnnIndexOps.annIndexStatsOf(s, dir, corpus).collect()
    val byCell = panel.map(r => r.getLong(0) -> r).toMap
    assert(byCell(-2L).getLong(1) === AnnIndexOps.adaptiveCells(n).toLong)
    assert(byCell(-3L).getLong(1) === n)
    assert(byCell(-2L).isNullAt(2) && byCell(-2L).isNullAt(3))
    s.catalog.clearCache()
  }

  test("non-default cell count: probe/admit/stats stay green at cells=16") {
    val corpus = Tables.embeddings(s, sf).select("vec_id", "embedding")
    val dir = freshDir("c16")
    AnnIndexOps.buildAnnIndex(corpus, dir, cells = 16)
    s.catalog.clearCache()
    assert(s.read.parquet(s"$dir/coarse").count() === 16L)
    assert(s.read.parquet(s"$dir/meta").head().getAs[Long]("cells") === 16L)
    // probe: well-formed ranked lists over the resized cell layout
    val probe = AnnIndexOps.probeAnnIndex(s, dir, corpus).collect()
    s.catalog.clearCache()
    assert(probe.nonEmpty)
    val byQ = probe.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"))).groupBy(_._1)
    byQ.values.foreach { rs =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks === (1L to ranks.length), "ranks are 1..k, no gaps")
      assert(ranks.length <= 5)
    }
    // assignment against the frozen 16-cell artifacts: every vector maps
    // to a live cell and reconstruction error is non-negative
    val assigned = AnnIndexOps.assignToIndex(s, dir, corpus).collect()
    s.catalog.clearCache()
    assert(assigned.length === corpus.count())
    assert(assigned.forall(_.getAs[Long]("err") >= 0L))
    assert(assigned.map(_.getAs[Long]("cell")).toSet.subsetOf((0L until 16L).toSet))
    // health panel: membership covers the corpus, meta row reads 16
    val panel = AnnIndexOps.annIndexStatsOf(s, dir, corpus).collect()
    assert(panel.filter(_.getLong(0) >= 0L).map(_.getLong(1)).sum === corpus.count())
    assert(panel.find(_.getLong(0) === -2L).get.getLong(1) === 16L)
    s.catalog.clearCache()
  }

  test("link_prediction_indexed: no brute pair scan, scores replay from its own edge set") {
    val out = GraphOps.linkPredictIndexed(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    s.catalog.clearCache()
    assert(out.nonEmpty, "the indexed substrate must yield candidates")
    // rebuild the edge set the key used (same landed index, all-queries
    // probe) and replay the scoring in-memory — CN/RA/Jaccard must match
    val idx = AnnIndexOps.fullIndex(s, sf)
    val nn = AnnIndexOps.probeAnnIndex(s, idx, Tables.embeddings(s, sf),
        topK = GraphOps.KnnK, allQueries = true).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
    s.catalog.clearCache()
    val edges = nn.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val expected = adj.keys.toSeq.sorted.combinations(2).flatMap { pair =>
      val (u, v) = (pair(0), pair(1))
      if (edges((u, v))) None else {
        val common = adj(u) intersect adj(v)
        if (common.size < GraphOps.LpMinCommon) None
        else Some((u, v, common.size.toLong,
          common.toSeq.map(z => 1000000L / adj(z).size).sum,
          common.size.toLong * 1000000L / (adj(u).size + adj(v).size - common.size)))
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(out.toSeq === expected, "indexed scoring must replay exactly")
    // the substrate stays degree-bounded: max symmetrized degree ~ 2K
    assert(adj.values.map(_.size).max <= 6 * GraphOps.KnnK,
      "index-sourced kNN graph must stay degree-bounded")
  }

  test("indexed vs brute substrate: both recover the planted community structure") {
    // The recall-transfer regime (the dedup_embedding_lsh precedent):
    // the keyed embeddings are near-orthogonal noise, where "nearest"
    // under exact cosine vs quantized ADC is arbitrary — edge-level
    // agreement there measures nothing. Plant 16 tight groups of 8 and
    // demand both substrates draw their kNN edges INSIDE groups: the
    // structure link prediction actually consumes must survive the
    // brute -> landed-index swap.
    import s.implicits._
    val rng = new scala.util.Random(42)
    val bases = Array.fill(16)(Array.fill(64)(if (rng.nextBoolean()) 1f else -1f))
    val rows = for (g <- 0 until 16; m <- 0 until 8) yield
      ((g * 8 + m).toLong,
        bases(g).map(x => x + (rng.nextFloat() - 0.5f) * 0.02f).toSeq)
    val planted = rows.toDF("vec_id", "embedding")
    val group = (id: Long) => id / 8
    val brute = GraphOps.knnEdges(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    s.catalog.clearCache()
    val dir = freshDir("planted")
    AnnIndexOps.buildAnnIndex(planted, dir)
    s.catalog.clearCache()
    val indexed = AnnIndexOps.probeAnnIndex(s, dir, planted,
        topK = GraphOps.KnnK, allQueries = true).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    s.catalog.clearCache()
    assert(brute.nonEmpty && indexed.nonEmpty)
    assert(brute.forall { case (u, v) => group(u) === group(v) },
      "brute kNN edges must stay within planted groups")
    assert(indexed.forall { case (u, v) => group(u) === group(v) },
      "index-sourced kNN edges must stay within planted groups")
    // every node participates in both substrates
    val bruteNodes = brute.flatMap { case (u, v) => Seq(u, v) }
    val idxNodes = indexed.flatMap { case (u, v) => Seq(u, v) }
    assert(bruteNodes.size === 128 && idxNodes.size === 128)
    // within the group regime the edge sets genuinely overlap
    val inter = (brute intersect indexed).size.toDouble
    val overlap = inter / math.min(brute.size, indexed.size)
    assert(overlap >= 0.5,
      s"overlap $overlap (brute=${brute.size}, indexed=${indexed.size}, inter=$inter)")
  }

  test("viterbiScore: planted case where Viterbi != greedy != optimal-count") {
    import graft.functions.Wordpiece
    // vocab {a,b,c,d,ab,bcd}: greedy("abcd") = ab|c|d = 3 tokens,
    // optimal count = a|bcd = 2; with cheap chars and expensive
    // multi-char tokens Viterbi takes a|b|c|d = 4 — three segmenters,
    // three different answers on one word
    val vocab = Seq("a", "b", "c", "d", "ab", "bcd")
    val costs = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 9L, "bcd" -> 9L)
    val maxLen = 3
    val sets = Array.fill(maxLen)(new java.util.HashSet[String]())
    vocab.foreach(t => sets(t.length - 1).add(t))
    val maps = Array.fill(maxLen)(new java.util.HashMap[String, java.lang.Long]())
    costs.foreach { case (t, c) => maps(t.length - 1).put(t, c) }
    assert(Wordpiece.segment("abcd", sets).length === 3, "greedy ab|c|d")
    assert(Wordpiece.minTokens("abcd", sets) === 2L, "optimal a|bcd")
    val sc = Wordpiece.viterbiScore("abcd", maps, 7L)
    assert(sc % Wordpiece.ViterbiScale === 4L, "Viterbi a|b|c|d on costs")
    assert(sc / Wordpiece.ViterbiScale === 4L, "total cost 4x1")
    // combined-scalar tie-break: equal cost prefers fewer tokens
    val maps2 = Array.fill(2)(new java.util.HashMap[String, java.lang.Long]())
    Seq("a" -> 2L, "b" -> 2L, "ab" -> 4L).foreach { case (t, c) =>
      maps2(t.length - 1).put(t, c) }
    val sc2 = Wordpiece.viterbiScore("ab", maps2, 7L)
    assert(sc2 / Wordpiece.ViterbiScale === 4L && sc2 % Wordpiece.ViterbiScale === 1L,
      "cost tie (a|b = ab = 4) resolves to the 1-token segmentation")
    // fallback fires only for off-vocabulary characters
    val sc3 = Wordpiece.viterbiScore("ax", maps2, 7L)
    assert(sc3 / Wordpiece.ViterbiScale === 9L && sc3 % Wordpiece.ViterbiScale === 2L)
    assert(Wordpiece.viterbiScore("", maps2, 7L) === 0L)
  }

  test("viterbi_segment keyed run: viterbi count bounded below by the optimum") {
    val rows = graft.operators.TokenizerOps.viterbiSegment(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    s.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nWords, nVit, vitCost, nOpt, over) =>
      assert(nVit >= nOpt, s"doc $docId: viterbi can never beat the count optimum")
      assert(nVit >= nWords, s"doc $docId: at least one token per word")
      assert(vitCost >= nVit, s"doc $docId: every token costs >= 1")
      assert(over === nVit * 1000000L / nOpt, s"doc $docId overhead arithmetic")
    }
  }

  test("walk_pmi: exact replay on a planted walk set") {
    import s.implicits._
    // two walks of length 4 (steps 0..3), window 2
    val walks = Seq(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 2L, 3L),
      (9L, 2L, 0L), (9L, 3L, 1L), (9L, 2L, 2L), (9L, 4L, 3L))
      .toDF("start", "node", "step")
    val out = GraphOps.walkPmiOf(walks).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    s.catalog.clearCache()
    // pairs within window 2, distinct endpoints, canonical:
    // walk1: (1,2)@0-1 (1,3)@0-2 (2,3)@1-2 (3,2)->(2,3)@2-3  [skip (2,2)@1-3]
    // walk2: (2,3)@0-1 [skip (2,2)@0-2] (3,2)->(2,3)@1-2 (3,4)@1-3 (2,4)@2-3
    // totals: 8 pairs; pc(2,3)=4, pc(1,2)=1, pc(1,3)=1, pc(3,4)=1, pc(2,4)=1
    // slots: cnt(1)=2 cnt(2)=6 cnt(3)=6 cnt(4)=2
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L)))
    assert(out((2L, 3L)) === ((4L, 6L, 6L, 4L * 8L * 1000000L / 36L)))
    assert(out((1L, 2L)) === ((1L, 2L, 6L, 8L * 1000000L / 12L)))
    assert(out((1L, 3L)) === ((1L, 2L, 6L, 8L * 1000000L / 12L)))
    assert(out((3L, 4L)) === ((1L, 6L, 2L, 8L * 1000000L / 12L)))
    assert(out((2L, 4L)) === ((1L, 6L, 2L, 8L * 1000000L / 12L)))
  }

  test("landWalkCorpus: landed store equals a fresh generation") {
    val base = freshDir("walks")
    GraphOps.landWalkCorpus(s, sf, base)
    val landed = s.read.parquet(s"$base/walks")
      .select("start", "node", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val fresh = GraphOps.graphRandomWalks(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    s.catalog.clearCache()
    assert(landed === fresh, "deterministic walks: landing is replayable")
    assert(landed.nonEmpty)
  }

  test("graph store lands edges: PPR and walks re-derive, replay appends nothing") {
    import s.implicits._
    val base = freshDir("gstore")
    // two planted batches sharing an edge (the replay hazard: a
    // duplicate row would shift degrees and with them every
    // degree-derived number downstream)
    val b1 = Seq((2L, 11L), (2L, 13L), (4L, 11L)).toDF("doc_a", "doc_b")
    val b2 = Seq((2L, 11L), (4L, 13L), (6L, 15L)).toDF("doc_a", "doc_b")
    graft.streaming.EventStreams.admitGraphBatch(b1, 0L, base)
    graft.streaming.EventStreams.admitGraphBatch(b2, 1L, base)
    graft.streaming.EventStreams.admitGraphBatch(b1, 2L, base) // replay
    val landed = s.read.parquet(s"$base/edges")
    val landedSet = landed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(landedSet.length === 5, "replayed batch must not re-append")
    assert(landedSet.toSet === Set((2L, 11L), (2L, 13L), (4L, 11L),
      (4L, 13L), (6L, 15L)))
    // probe-after-admission equality: walks and PPR over the landed
    // edge set equal a from-scratch run over the logical union
    val union = b1.union(b2).distinct()
    val wStore = GraphOps.randomWalksOnPairs(landed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val wFresh = GraphOps.randomWalksOnPairs(union).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(wStore === wFresh && wStore.nonEmpty)
    val seeds = Seq(2L).toDF("node")
    def sym(p: org.apache.spark.sql.DataFrame) =
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val pStore = GraphOps.pprOnEdges(sym(landed), seeds, GraphOps.PRIterations)
      .collect().map(r => (r.getAs[Long]("node"), r.get(1).toString)).sorted.toSeq
    val pFresh = GraphOps.pprOnEdges(sym(union), seeds, GraphOps.PRIterations)
      .collect().map(r => (r.getAs[Long]("node"), r.get(1).toString)).sorted.toSeq
    assert(pStore === pFresh && pStore.nonEmpty)
    s.catalog.clearCache()
  }

  test("node2vec_walks: planted replay against an independent CDF implementation") {
    import s.implicits._
    val pairs = Seq((2L, 11L), (2L, 13L), (4L, 11L)).toDF("c", "s")
    val out = GraphOps.node2vecWalksOnPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.catalog.clearCache()
    val adj = Map(2L -> Seq(11L, 13L), 4L -> Seq(11L),
      11L -> Seq(2L, 4L), 13L -> Seq(2L))
    val eset = Set((2L, 11L), (11L, 2L), (2L, 13L), (13L, 2L),
      (4L, 11L), (11L, 4L))
    var sawBias = false
    def walk(start: Long): Seq[Long] = {
      var prev = -1L; var cur = start
      var path = Seq(start)
      (1 to GraphOps.RwSteps).foreach { i =>
        val ns = adj(cur)
        val wts = ns.map(x =>
          if (x == prev) GraphOps.N2vReturnW
          else if (eset((prev, x))) GraphOps.N2vTriadW
          else GraphOps.N2vOutW)
        if (wts.distinct.size > 1) sawBias = true
        val tot = wts.sum
        val r = ((cur % 1000003L) * 2654435761L + i * 40503L) % tot
        var cum = 0L; var pick = -1L
        ns.zip(wts).foreach { case (x, w) =>
          if (pick < 0) { cum += w; if (r < cum) pick = x } }
        prev = cur; cur = pick; path = path :+ cur
      }
      path
    }
    val expected = adj.keys.map(st => st -> walk(st)).toMap
    val byStart = out.groupBy(_._1)
    assert(byStart.keySet === adj.keySet)
    byStart.foreach { case (st, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L to GraphOps.RwSteps.toLong))
      assert(rows.sortBy(_._3).map(_._2).toSeq === expected(st), s"start $st")
    }
    assert(sawBias, "the planted graph must exercise a non-uniform CDF")
  }

  test("node2vec_walks keyed run: walks follow real edges, one per node") {
    val rows = GraphOps.graphNode2vecWalks(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.catalog.clearCache()
    assert(rows.nonEmpty)
    val byStart = rows.groupBy(_._1)
    // walks alternate bipartite sides (even customer / odd supplier)
    byStart.foreach { case (st, rs) =>
      val path = rs.sortBy(_._3).map(_._2).toSeq
      assert(path.length === GraphOps.RwSteps + 1)
      assert(path.head === st)
      path.sliding(2).foreach { p =>
        assert((p(0) + p(1)) % 2 === 1L, "co-purchase edges are bipartite") }
    }
    // determinism: a second run is byte-identical
    val again = GraphOps.graphNode2vecWalks(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.catalog.clearCache()
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("TempStores.fingerprint changes when a corpus file is rewritten") {
    val d = freshDir("fp")
    val f = java.nio.file.Paths.get(d, "t.parquet")
    java.nio.file.Files.write(f, "aaaa".getBytes)
    val fp1 = TempStores.fingerprint(d)
    assert(TempStores.fingerprint(d) === fp1, "stable when untouched")
    java.nio.file.Files.write(f, "bbbbbb".getBytes) // size change
    assert(TempStores.fingerprint(d) !== fp1)
    assert(TempStores.fingerprint("/nonexistent/graft") === "absent")
  }
}
