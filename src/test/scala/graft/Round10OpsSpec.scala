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
