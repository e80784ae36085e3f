package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RetrievalOps, SimilarityOps, TextOps}

/** Round-10 operators: the bucketed dense-retrieval family
  * (doc_neighbors_lsh / chunk_neighbors_lsh / hard_negatives_lsh) that
  * replaces the brute |Q|·n dense leg at scale.
  *
  * Regime note (the RecallSpec convention): recall claims are asserted
  * in the PLANTED near-dup regime (cos ≈ 1 twins — what dedup/retrieval
  * must never miss, and where multi-probe hyperplane LSH is exact);
  * organic top-k recall is recorded via info() only, since it measures
  * the corpus's angle distribution, not the operator. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.1"

  test("doc_neighbors_lsh: planted identical twin of every query doc surfaces at cos 1.0") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    // an identical re-ingest of every query doc under a fresh id (not
    // itself a query): identical text → identical hashed vector →
    // identical bucket → the mask-0 probe must find it at cos exactly 1
    val twins = docs.filter(col("doc_id") % SimilarityOps.QueryModulus === 0)
      .select((col("doc_id") + 1000001L).as("doc_id"), col("text"))
    val out = TextOps.docNeighborsLshFromVectors(
        TextOps.docNeighborVectorsOf(docs.unionByName(twins))).collect()
    s.catalog.clearCache()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    val qIds = byQ.keys.filter(_ <= 1000000L).toSeq
    assert(qIds.nonEmpty)
    qIds.foreach { q =>
      val hit = byQ(q).find(_.getAs[Long]("n_id") == q + 1000001L)
      assert(hit.isDefined, s"query $q must retrieve its planted twin")
      // identical vectors: dot/(√n·√n) — IEEE round-off may land an ulp
      // above 1.0, so pin to 1.0 within an ulp-scale tolerance
      assert(math.abs(hit.get.getAs[Double]("cos_sim") - 1.0) < 1e-12)
    }
  }

  test("doc_neighbors_lsh: exact scores on candidates; recall vs brute recorded (sf0.001)") {
    val lsh = TextOps.docNeighborsLsh(s, sf).collect()
    val brute = TextOps.docNeighbors(s, sf).collect()
    s.catalog.clearCache()
    assert(lsh.nonEmpty)
    // precision of the scorer is 1.0 by construction: any pair surfaced
    // by LSH must carry the identical exact cosine the brute leg computes
    val bruteScore = brute.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("cos_sim")).toMap
    lsh.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      bruteScore.get(k).foreach(b => assert(b == r.getAs[Double]("cos_sim"),
        s"cosine mismatch vs brute for $k"))
    }
    val bSet = brute.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lSet = lsh.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (lSet & bSet).size.toDouble / bSet.size
    info(f"doc_neighbors_lsh organic top-5 recall vs brute: $recall%.4f")
    assert(recall >= 0.4, f"recall collapsed: $recall%.4f")
    // ranks dense from 1 per query
    lsh.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("chunk_neighbors_lsh: planted twin doc's identical chunks surface; scores exact (sf0.001)") {
    val out = TextOps.chunkNeighborsLsh(s, sf).collect()
    s.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("q_doc") != r.getAs[Long]("n_doc"),
      "same-doc chunks must be excluded"))
    out.groupBy(r => (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk")))
      .foreach { case (_, rows) =>
        assert(rows.length <= 5)
        assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rows.length).toSeq)
      }
    val brute = TextOps.chunkNeighbors(s, sf).collect()
    s.catalog.clearCache()
    val bruteScore = brute.map(r =>
      (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk"),
        r.getAs[Long]("n_doc"), r.getAs[Long]("n_chunk")) -> r.getAs[Double]("cos_sim")).toMap
    out.foreach { r =>
      val k = (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk"),
        r.getAs[Long]("n_doc"), r.getAs[Long]("n_chunk"))
      bruteScore.get(k).foreach(b => assert(b == r.getAs[Double]("cos_sim")))
    }
    val bSet = brute.map(r => (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk"),
      r.getAs[Long]("n_doc"), r.getAs[Long]("n_chunk"))).toSet
    val lSet = out.map(r => (r.getAs[Long]("q_doc"), r.getAs[Long]("q_chunk"),
      r.getAs[Long]("n_doc"), r.getAs[Long]("n_chunk"))).toSet
    val recall = (lSet & bSet).size.toDouble / bSet.size
    info(f"chunk_neighbors_lsh organic top-5 recall vs brute: $recall%.4f")
    assert(recall >= 0.3, f"recall collapsed: $recall%.4f")
  }

  test("hard_negatives_lsh: planted cross-label twin is rank 1; same-label never surfaces") {
    import s.implicits._
    val rows = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.999f, 0.01f, 0.0f, 0.0f), 2), // cross-label twin
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),    // same-label identical
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 2),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
      // lshBucket expects 64-dim embeddings (the plane family's width)
      .withColumn("embedding",
        concat(col("embedding"), array((0 until 60).map(_ => lit(0.0f)): _*)))
    val out = SimilarityOps.hardNegativesLshFrom(rows).collect()
    s.catalog.clearCache()
    val q = out.filter(_.getAs[Long]("q_id") == 100L).sortBy(_.getAs[Long]("rnk"))
    assert(q.nonEmpty)
    assert(q.head.getAs[Long]("n_id") == 1L,
      "the cross-label near-twin shares the query's bucket and must be rank 1")
    assert(q.forall(_.getAs[Int]("n_label") != 1))
    assert(!q.exists(_.getAs[Long]("n_id") == 2L))
  }

  test("docLshBucketN: the plane family is prefix-stable (8-plane bucket's low 6 bits == 6-plane bucket)") {
    // growing the plane count must REFINE buckets, not reshuffle them —
    // the property that lets a growing corpus re-bucket incrementally
    // (each added plane splits every existing bucket in two)
    val fv = TextOps.docNeighborVectorsOf(
      Tables.documents(s, sf).select("doc_id", "text"))
    val both = fv.select(col("doc_id"),
      TextOps.docLshBucketN(col("v"), 6).as("b6"),
      TextOps.docLshBucketN(col("v"), 8).as("b8")).collect()
    s.catalog.clearCache()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert((r.getAs[Long]("b8") & 63L) == r.getAs[Long]("b6"),
        s"doc ${r.getAs[Long]("doc_id")}: plane family not prefix-stable")
    }
  }

  test("doc_neighbors_ivf: planted identical twin shares the query's cell and surfaces at cos 1.0") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    // identical text → identical integer vector → identical cell (argmin
    // is a pure function of v) → the probe must find it at cos exactly 1
    val twins = docs.filter(col("doc_id") % SimilarityOps.QueryModulus === 0)
      .select((col("doc_id") + 1000001L).as("doc_id"), col("text"))
    val fv = TextOps.docNeighborVectorsOf(docs.unionByName(twins))
      .select(col("doc_id").as("vec_id"), col("v"),
        aggregate(col("v"), lit(0L), (a, x) => a + x * x).as("nrm"))
    val out = TextOps.docNeighborsIvfFrom(fv).collect()
    s.catalog.clearCache()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    val qIds = byQ.keys.filter(_ <= 1000000L).toSeq
    assert(qIds.nonEmpty)
    qIds.foreach { q =>
      val hit = byQ(q).find(_.getAs[Long]("n_id") == q + 1000001L)
      assert(hit.isDefined, s"query $q must retrieve its planted twin")
      assert(math.abs(hit.get.getAs[Double]("cos_sim") - 1.0) < 1e-12)
    }
  }

  test("doc_neighbors_ivf: exact scores on candidates; recall vs brute recorded (sf0.001)") {
    val ivf = TextOps.docNeighborsIvf(s, sf).collect()
    val brute = TextOps.docNeighbors(s, sf).collect()
    s.catalog.clearCache()
    assert(ivf.nonEmpty)
    val bruteScore = brute.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("cos_sim")).toMap
    ivf.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      bruteScore.get(k).foreach(b => assert(b == r.getAs[Double]("cos_sim"),
        s"cosine mismatch vs brute for $k"))
    }
    val bSet = brute.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val iSet = ivf.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (iSet & bSet).size.toDouble / bSet.size
    info(f"doc_neighbors_ivf organic top-5 recall vs brute: $recall%.4f")
    assert(recall >= 0.3, f"recall collapsed: $recall%.4f")
    ivf.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("retrieval_index_stats: consistency rows agree; planted vocab drift flags oov_e6") {
    import s.implicits._
    import graft.operators.RetrievalIndexOps
    // keyed panel on sf data: internal consistency of the landed index
    val out = RetrievalIndexOps.retrievalIndexStats(s, sf).collect()
    s.catalog.clearCache()
    val m = out.map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    // 14 rows: the 11 consistency/drift metrics + the landed
    // (planes, built_docs) index metadata + the chunk-artifact count
    assert(m.size == 14)
    assert(m("planes") == TextOps.adaptivePlanes(m("built_docs")),
      "panel must surface the landed adaptive plane count")
    assert(m("chunks_docs") > 0L,
      "the late-interaction leg must be present in a fresh index")
    assert(m("doclens_docs") == m("postings_docs"),
      "every postings doc must have its doclens row (admission healed)")
    assert(m("buckets_docs") == m("vectors_docs"),
      "every vector must have its bucket row")
    assert(m("admitted_pairs_total") >= m("admitted_pairs_oov"))
    assert(m("oov_e6") == (if (m("admitted_pairs_total") == 0) 0L
      else m("admitted_pairs_oov") * 1000000L / m("admitted_pairs_total")))
    // planted drift: vocabulary frozen on a 5-token corpus, then a batch
    // arrives speaking 5 new words — the panel must flag the drift
    val base = java.nio.file.Files.createTempDirectory("graft_ridx_stats").toString
    val corpus = Seq((1L, "aa bb cc"), (2L, "aa bb dd"), (3L, "cc dd ee"))
      .toDF("doc_id", "text")
    RetrievalIndexOps.buildRetrievalIndex(s, corpus, base)
    val drifted = Seq((10L, "zz yy xx"), (11L, "ww vv aa")).toDF("doc_id", "text")
    RetrievalIndexOps.admitToRetrievalIndex(s, base, drifted)
    val p = RetrievalIndexOps.retrievalIndexStatsOf(s, base, drifted).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    s.catalog.clearCache()
    assert(p("kept_vocab_size") == 5L)
    assert(p("admitted_pairs_total") == 6L)
    assert(p("admitted_pairs_oov") == 5L, "only 'aa' is in the frozen vocab")
    assert(p("oov_e6") == 833333L)
    // doc 10 has zero in-vocab tokens: absent from the sparse leg by
    // design — the panel shows it (dense admits 2, sparse admits 1)
    assert(p("admitted_docs_sparse") == 1L)
    assert(p("admitted_docs_dense") == 2L)
    // a same-vocabulary batch admits with zero drift
    val same = Seq((20L, "aa bb"), (21L, "cc dd ee")).toDF("doc_id", "text")
    RetrievalIndexOps.admitToRetrievalIndex(s, base, same)
    val p2 = RetrievalIndexOps.retrievalIndexStatsOf(s, base, same).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    s.catalog.clearCache()
    assert(p2("admitted_pairs_oov") == 0L)
    assert(p2("oov_e6") == 0L)
    assert(p2("admitted_docs_sparse") == 2L)
  }

  test("landRetrievalIndexAdmissionStream: micro-batches grow the text index; replay appends nothing") {
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{DedupOps, RetrievalIndexOps}
    val dir = java.nio.file.Files.createTempDirectory("graft_ridx_stream").toString
    val split = DedupOps.IncrementalSplit
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    RetrievalIndexOps.buildRetrievalIndex(s, docs.filter(col("doc_id") < split), dir)
    s.catalog.clearCache()
    val batchRows = docs.filter(col("doc_id") >= split).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(batchRows.length >= 2)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    val in = MemoryStream[(Long, String)](s)
    val q = graft.streaming.EventStreams.landRetrievalIndexAdmissionStream(
      in.toDF().toDF("doc_id", "text"), dir)
    try {
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      // replayed delivery of batch 1 inside the stream: no growth
      in.addData(b1.toSeq); q.processAllAvailable()
    } finally q.stop()
    // the streamed index is IDENTICAL to one batch admission of the
    // full batch — per-artifact, row for row
    val twin = java.nio.file.Files.createTempDirectory("graft_ridx_twin").toString
    RetrievalIndexOps.buildRetrievalIndex(s, docs.filter(col("doc_id") < split), twin)
    RetrievalIndexOps.admitToRetrievalIndex(s, twin,
      docs.filter(col("doc_id") >= split))
    for (a <- Seq("postings", "doclens", "vectors", "buckets", "chunks")) {
      val sa = s.read.parquet(s"$dir/$a").collect().map(_.toString).sorted.toSeq
      val sb = s.read.parquet(s"$twin/$a").collect().map(_.toString).sorted.toSeq
      assert(sa == sb, s"streamed $a diverged from batch admission")
    }
    // and both probes serve streamed docs — the RRF one and the
    // late-interaction one (streamed chunk rows are immediately
    // passage-retrievable)
    val out = RetrievalIndexOps.probeRetrievalIndex(s, dir).collect()
    assert(out.exists(_.getAs[Long]("q_id") >= split))
    val ms = RetrievalIndexOps.probeRetrievalIndexMaxsim(s, dir).collect()
    s.catalog.clearCache()
    assert(ms.exists(r => r.getAs[Long]("q_doc") >= split ||
      r.getAs[Long]("n_doc") >= split))
  }

  test("hard_negatives_lsh (sf0.1): labels differ, scores exact, recall vs brute recorded") {
    val lsh = SimilarityOps.hardNegativesLsh(s, sf01).collect()
    val brute = SimilarityOps.hardNegatives(s, sf01).collect()
    s.catalog.clearCache()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("n_label"))
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("n_id"))
    }
    val bruteScore = brute.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("cos_sim")).toMap
    lsh.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      bruteScore.get(k).foreach(b => assert(b == r.getAs[Double]("cos_sim")))
    }
    val bSet = brute.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lSet = lsh.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (lSet & bSet).size.toDouble / bSet.size
    info(f"hard_negatives_lsh organic recall vs brute (near-orthogonal regime): $recall%.4f")
    assert(recall >= 0.35, f"recall collapsed: $recall%.4f")
  }
}
