package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Keyword retrieval over the documents table — the search side of a
  * training-data / RAG pipeline (the reference's query surface has no
  * search operator; this is part of the LLM-data widening).
  *
  * Shape at scale: per-document term frequencies come from codegen'd
  * array lambdas over ONE split of the text (no explode, no shuffle);
  * corpus statistics (N, total length, per-term document frequencies)
  * ride a SINGLE single-row aggregation that is broadcast-crossed back;
  * the global top-k is TakeOrderedAndProject (per-partition heads + one
  * k-row merge), never a full sort. So a 100 TB corpus is scored in one
  * scan with one k-sized driver merge.
  */
object RetrievalOps {

  /** Fixed query for the oracle-checked entry (terms exist corpus-wide). */
  val QueryTerms: Seq[String] = Seq("spark", "vector", "query")
  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  /** bm25_topk — BM25 ranking of all documents against [[QueryTerms]],
    * top-[[TopK]] with a doc_id tie-break.
    *
    * Determinism contract (same as text_tfidf): the ln-free BM25 idf
    * variant (N − df + 0.5)/(df + 0.5) keeps every input an exact
    * integer (plus exactly-representable 0.5/0.75 constants), and the
    * double chain is written with IDENTICAL association in the DuckDB
    * oracle, so scores hash-compare bit-identically — a transcendental
    * ln idf would be libm-specific. */
  def bm25Topk(s: SparkSession, dir: String, k: Int = TopK): DataFrame =
    bm25Docs(Tables.documents(s, dir), k)

  /** Core on any documents-shaped frame (testable / probe-able). */
  def bm25Docs(docs: DataFrame, k: Int = TopK): DataFrame = {
    // materialize the split ONCE as a column (the winnowing lesson:
    // expressions referenced inside array lambdas are re-evaluated per
    // element if left as expressions)
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
    val tfCols = QueryTerms.map(t =>
      size(filter(col("w"), y => y === t)).cast("long").as(s"tf_$t"))
    val perDoc = base.select(col("doc_id") +: col("dl") +: tfCols: _*)

    // ONE single-row aggregation carries every corpus statistic
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
      QueryTerms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    val dlNorm = col("dl").cast("double") / (col("sumdl").cast("double") / col("n"))
    def termScore(t: String) =
      (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) *
        (col(s"tf_$t") * lit(K1 + 1)) /
        (col(s"tf_$t") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * dlNorm))
    val score = QueryTerms.map(termScore).reduceLeft(_ + _)

    val top = perDoc.join(broadcast(stats))
      .select(col("doc_id") +: col("dl") +: QueryTerms.map(t => col(s"tf_$t")) :+
        score.as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // ranking the k survivors: a k-row single partition, not the corpus
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .orderBy("rnk")
  }

  /** RRF constants — standard k₀=60 (Cormack & Clarke's reciprocal-rank
    * fusion), with the 1/(k₀+r) term scaled to an e6 INTEGER via integer
    * division so fused scores sum order-independently and the DuckDB
    * twin is bit-exact (`div` here ≡ `//` there for positive operands —
    * no float reciprocal to accumulate). */
  val RrfK0 = 60L
  val RrfScale = 1000000L
  /** Per-leg candidate pool depth (matches docNeighbors' default k so
    * the semantic leg reuses that key's twin verbatim). */
  val PoolK = 5

  /** lexical_neighbors — top-k most similar documents per query doc by
    * DISTINCT-TOKEN-set Jaccard, as an exact e6 integer: the sparse
    * keyword leg of hybrid retrieval ([[TextOps.docNeighbors]] is the
    * dense leg over the same query convention). Candidate generation is
    * the posting-list self-join with the shared df cap
    * ([[DedupOps.MaxShingleDf]]): tokens appearing in more than `cap`
    * docs (stopwords, boilerplate) generate no candidate pairs, which
    * bounds per-token join fan-out at 100 TB exactly like the n-gram
    * dedup family — and set sizes count KEPT tokens only, mirrored in
    * the oracle. j_e6 = ⌊common·10⁶ / |A∪B|⌋ in pure integer arithmetic
    * (no doubles anywhere in this key). */
  def lexicalNeighbors(s: SparkSession, dir: String, k: Int = PoolK): DataFrame =
    lexicalNeighborsDocs(Tables.documents(s, dir), k)

  /** Core on any documents-shaped frame (testable / probe-able). */
  def lexicalNeighborsDocs(docs: DataFrame, k: Int = PoolK): DataFrame = {
    val sh = lexicalPostings(docs)
    lexicalFromPostings(sh, lexicalDocLens(sh), k)
  }

  /** The df-capped (doc_id, tok) posting list — also the `postings/`
    * artifact [[RetrievalIndexOps]] lands (the kept-token set is decided
    * at BUILD time against the whole corpus, exactly as here). */
  private[operators] def lexicalPostings(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val kept = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DedupOps.MaxShingleDf).select("tok")
    tok.join(kept, "tok")
  }

  /** Per-doc kept-token counts — the `doclens/` artifact. */
  private[operators] def lexicalDocLens(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_tok"))

  /** Sparse-leg core on any posting-list + doc-length pair (inline or
    * landed). */
  private[operators] def lexicalFromPostings(sh: DataFrame, sz: DataFrame,
      k: Int = PoolK): DataFrame = {
    val pr = sh.filter(SimilarityOps.isQuery(col("doc_id")))
      .select(col("doc_id").as("q_id"), col("tok"))
      .join(sh.select(col("doc_id").as("n_id"), col("tok")), "tok")
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id").agg(count(lit(1)).cast("long").as("common"))
    val j = pr
      .join(sz.select(col("doc_id").as("q_id"), col("n_tok").as("qn")), "q_id")
      .join(sz.select(col("doc_id").as("n_id"), col("n_tok").as("nn")), "n_id")
      .withColumn("j_e6", expr(s"(common * $RrfScale) div (qn + nn - common)"))
    val w = Window.partitionBy("q_id").orderBy(col("j_e6").desc, col("n_id"))
    j.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "common", "j_e6", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** hybrid_retrieval — reciprocal-rank fusion of the dense and sparse
    * retrieval legs: [[TextOps.docNeighborsLsh]] (bucketed hashed-
    * embedding cosine — the scale-shaped dense leg; the brute
    * `doc_neighbors` stays shipped as the recall baseline) and
    * [[lexicalNeighbors]] (token-set Jaccard), fused per query doc
    * with rrf = Σ_legs ⌊10⁶/(60+rank)⌋ (a candidate absent from a leg
    * contributes 0). This is the standard RAG-stack retrieval shape —
    * BM25/keyword ∪ vector search → RRF — run corpus-side: each leg's
    * pool is its existing top-k key, so the fusion stage only ever
    * touches queries × 2k candidate rows (a full-outer align on
    * (q_id, n_id) + one bounded rank window), regardless of corpus
    * size — and BOTH legs' candidate volumes are now bounded (df-cap
    * posting pairs / LSH bucket collisions), so no stage carries a
    * |Q|·n term. Scores are pure integers end to end (see
    * [[RrfScale]]); leg ranks ride along as provenance (0 = not in
    * that leg's pool). */
  def hybridRetrieval(s: SparkSession, dir: String, k: Int = PoolK): DataFrame =
    fuseRrf(TextOps.docNeighborsLsh(s, dir, PoolK),
      lexicalNeighbors(s, dir, PoolK), k)

  /** hybrid_retrieval_ivf — the fused key on the ALTERNATE dense leg:
    * [[TextOps.docNeighborsIvf]] (coarse-quantizer cell probing) replaces
    * the LSH leg inside the same RRF fusion, completing the two-lever
    * story: LSH planes and IVF cells are the two candidate-source
    * levers a production retrieval stack chooses between (planes grow
    * with log₂(corpus) holding bucket occupancy flat; cells grow with
    * √corpus so the probed FRACTION shrinks). Sparse leg and fusion
    * arithmetic are shared verbatim with [[hybridRetrieval]]; the
    * oracle pins the IVF leg per [[graft.OracleSql]]'s unrolled-kmeans
    * twin, so each leg's fused behavior is independently hash-checked. */
  def hybridRetrievalIvf(s: SparkSession, dir: String, k: Int = PoolK): DataFrame =
    fuseRrf(TextOps.docNeighborsIvf(s, dir, PoolK),
      lexicalNeighbors(s, dir, PoolK), k)

  /** RRF fusion core over any two ranked legs (each (q_id, n_id, rnk))
    * — shared by the inline key and the landed-index probe. */
  private[operators] def fuseRrf(semRanked: DataFrame, lexRanked: DataFrame,
      k: Int = PoolK): DataFrame = {
    val sem = semRanked.select(col("q_id"), col("n_id"), col("rnk").as("sem_rnk"))
    val lex = lexRanked.select(col("q_id"), col("n_id"), col("rnk").as("lex_rnk"))
    def leg(c: String) =
      expr(s"CASE WHEN $c > 0 THEN $RrfScale div ($RrfK0 + $c) ELSE 0L END")
    val fused = sem.join(lex, Seq("q_id", "n_id"), "full_outer")
      .select(col("q_id"), col("n_id"),
        coalesce(col("sem_rnk"), lit(0L)).as("sem_rnk"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"))
      .withColumn("rrf_e6", leg("sem_rnk") + leg("lex_rnk"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf_e6").desc, col("n_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "rrf_e6", "sem_rnk", "lex_rnk", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** MMR constants: select [[MmrK]] of the [[PoolK]]-deep fused pool;
    * λ = 0.7 carried as the integer weight pair (7, 3) so the score
    * 7·rel − 3·maxsim is an exact long (the /10 normalization is a
    * monotone constant — argmax unchanged, no doubles introduced).
    * Relevance is the fused rank mapped onto the e6 scale,
    * rel_e6 = (PoolK+1 − rnk)·(10⁶/PoolK) ∈ {2·10⁵ … 10⁶}, so the
    * redundancy penalty (Jaccard e6 ∈ [0, 10⁶]) competes on the SAME
    * scale — raw rrf_e6 tops out at ~3.3·10⁴ and would let any nonzero
    * overlap swamp relevance. */
  val MmrK = 3
  val MmrLam = 7L
  val MmrLamC = 3L

  /** mmr_diversify — MAXIMAL MARGINAL RELEVANCE re-ranking of the hybrid
    * retrieval pool (Carbonell & Goldstein 1998): greedily pick the
    * candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    * selected, so the final k answers are relevant AND mutually diverse —
    * the dedup-at-serving-time stage a RAG stack runs after fusion (three
    * near-identical passages waste two context slots; MMR returns one
    * plus two different angles). Candidate↔candidate redundancy is the
    * same df-capped kept-token Jaccard as [[lexicalNeighbors]] (pairs
    * sharing no kept token count 0 — independent by construction).
    *
    * The greedy loop is UNROLLED ([[MmrK]] fixed rounds — the BPE/kmeans
    * oracle convention): each round anti-joins the selected set, folds a
    * max-sim per remaining candidate, and takes one row per query via a
    * bounded window. Every frame after the pool is queries × ≤PoolK
    * rows, so the diversification stage costs O(|Q|·k²) REGARDLESS of
    * corpus size; the corpus-proportional work is exactly the two
    * retrieval legs it composes (both already scale-shaped). Pool and
    * postings persist across rounds (multi-consumer contract). */
  def mmrDiversify(s: SparkSession, dir: String, k: Int = MmrK): DataFrame =
    mmrDiversifyDocs(Tables.documents(s, dir), k)

  /** Core on any documents-shaped frame (testable / probe-able).
    * `poolK` parameterizes the per-leg pool depth (the keyed query pins
    * [[PoolK]]; ScaleProbe runs production-sized pools through the same
    * code path — the greedy loop is a RUNTIME loop over k rounds, so
    * there is no unroll-count ceiling on the Spark side; only the
    * DuckDB twin unrolls, and only at the keyed [[MmrK]]). */
  def mmrDiversifyDocs(docs: DataFrame, k: Int = MmrK,
      poolK: Int = PoolK): DataFrame = {
    val sh = lexicalPostings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sz = lexicalDocLens(sh)
    // the pool is |Q|·k rows consumed by every greedy round — CHECKPOINT
    // (not persist): the rounds' growing self-referential lineage would
    // otherwise replay the full two-leg retrieval plan per reference
    val pool = fuseRrf(
        TextOps.docNeighborsLshFromVectors(
          TextOps.docNeighborVectorsOf(docs), poolK),
        lexicalFromPostings(sh, sz, poolK), poolK)
      .localCheckpoint()
    mmrFromPool(pool, sh, sz, k, poolK)
  }

  /** Greedy MMR core over any fused pool + posting-list pair. */
  private[operators] def mmrFromPool(pool: DataFrame, sh: DataFrame,
      sz: DataFrame, k: Int = MmrK, poolK: Int = PoolK): DataFrame = {
    val relUnit = RrfScale / poolK
    val p = pool.select(col("q_id"), col("n_id"),
      ((lit(poolK + 1L) - col("rnk")) * lit(relUnit)).as("rel_e6"))

    // pairwise kept-token Jaccard among docs that appear in ANY pool —
    // the candidate set is |Q|·PoolK docs, and the df cap bounds the
    // co-token self-join exactly as in the lexical leg itself
    val cand = p.select(col("n_id").as("doc_id")).distinct()
    val shc = sh.join(cand, "doc_id")
    val common = shc.select(col("doc_id").as("a_id"), col("tok"))
      .join(shc.select(col("doc_id").as("b_id"), col("tok")), "tok")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).cast("long").as("common"))
    val simAB = common
      .join(sz.select(col("doc_id").as("a_id"), col("n_tok").as("an")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("n_tok").as("bn")), "b_id")
      .select(col("a_id"), col("b_id"),
        expr(s"(common * $RrfScale) div (an + bn - common)").as("sim_e6"))
    val sim = simAB.select(col("a_id").as("n_id"), col("b_id").as("m_id"), col("sim_e6"))
      .unionByName(simAB.select(col("b_id").as("n_id"), col("a_id").as("m_id"), col("sim_e6")))
    // per-query candidate pairs with absent-sim = 0 (disjoint token sets)
    val mem = p.select("q_id", "n_id")
    val psim = mem.join(mem.withColumnRenamed("n_id", "m_id"), "q_id")
      .filter(col("n_id") =!= col("m_id"))
      .join(sim, Seq("n_id", "m_id"), "left")
      .select(col("q_id"), col("n_id"), col("m_id"),
        coalesce(col("sim_e6"), lit(0L)).as("sim_e6"))
      .localCheckpoint()

    val byScore = Window.partitionBy("q_id").orderBy(col("mmr_w").desc, col("n_id"))
    var selected = p
      .withColumn("maxsim_e6", lit(0L))
      .withColumn("mmr_w", lit(MmrLam) * col("rel_e6"))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("n_id"), col("rel_e6"), col("maxsim_e6"),
        col("mmr_w"), lit(1L).as("rnk"))
    for (t <- 2 to k) {
      val rem = p.join(selected.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_anti")
      val ms = psim
        .join(selected.select(col("q_id"), col("n_id").as("m_id")), Seq("q_id", "m_id"))
        .groupBy("q_id", "n_id").agg(max("sim_e6").as("ms"))
      val scored = rem.join(ms, Seq("q_id", "n_id"), "left")
        .withColumn("maxsim_e6", coalesce(col("ms"), lit(0L)))
        .withColumn("mmr_w",
          lit(MmrLam) * col("rel_e6") - lit(MmrLamC) * col("maxsim_e6"))
      // lazy checkpoint: the next round consumes `selected` twice (the
      // anti-join and the max-sim fold) and the final output a third
      // time — without it the round plans re-derive each other
      selected = selected.unionByName(
        scored.withColumn("rk", row_number().over(byScore))
          .filter(col("rk") === 1)
          .select(col("q_id"), col("n_id"), col("rel_e6"), col("maxsim_e6"),
            col("mmr_w"), lit(t.toLong).as("rnk")))
        .localCheckpoint(false)
    }
    selected.orderBy("q_id", "rnk")
  }

  /** maxsim_retrieval — LATE-INTERACTION document retrieval (the
    * ColBERT scoring rule, Khattab & Zaharia 2020, re-expressed as
    * relational algebra): score(Q, D) = Σ over Q's chunks of the MAX
    * cosine against any chunk of D, over the [[TextOps.chunkEmbed]]
    * chunk vectors. Where doc_neighbors compares one pooled vector per
    * document (fine-grained matches wash out in the mean), MaxSim lets
    * EACH query passage pick its best-matching passage in the candidate
    * doc — the retrieval quality step between single-vector ANN and a
    * cross-encoder.
    *
    * Exactness: each pair cosine collapses to an e6 integer
    * (floor(cos·10⁶+0.5)) BEFORE the max/sum reductions, so the
    * per-doc score is an exact long — accumulation order can't perturb
    * the ranking, and the DuckDB twin reproduces it bit-for-bit.
    *
    * Shape: chunk pairs → max per (q_chunk, n_doc) → sum per (q_doc,
    * n_doc) — two partial-agg groupBys on top of the same broadcast-
    * queries × corpus-chunk scan as chunk_neighbors. This brute form is
    * the correctness baseline; [[maxsimRetrievalLsh]] is the 100×
    * candidate-bounded path. */
  def maxsimRetrieval(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    maxsimFromChunks(TextOps.chunkVectors(s, dir), k)

  /** Brute core on any (doc_id, chunk_id, v, nrm) chunk-vector frame;
    * `qPred` picks the query docs (ScaleProbe restricts recall baselines
    * to base-corpus queries so the brute side stays bounded). */
  private[graft] def maxsimFromChunks(cv: DataFrame, k: Int = 5,
      qPred: Column = col("doc_id") % SimilarityOps.QueryModulus === 0): DataFrame = {
    val q = cv.filter(qPred)
      .select(col("doc_id").as("q_doc"), col("chunk_id").as("q_chunk"),
        col("v").as("qv"), col("nrm").as("qn"))
    val pairs = cv.join(broadcast(q), col("q_doc") =!= col("doc_id"))
      .select(col("q_doc"), col("q_chunk"), col("doc_id").as("n_doc"),
        chunkSimE6.as("sim_e6"))
    maxsimRank(pairs, k)
  }

  /** maxsim_retrieval_lsh — MaxSim over BUCKETED candidates: the same
    * [[TextOps.docLshBucket]] hyperplane family + multi-probe masks as
    * chunk_neighbors_lsh gates which chunk pairs are scored, max/sum
    * run over surviving pairs only (a query chunk with no collision in
    * a doc contributes 0 — the standard approximate-MaxSim pruning).
    * Candidate volume is bucket-density-bounded instead of |Q-chunks| ·
    * corpus-chunks — the production leg at 10⁹ docs, with recall
    * measurable against [[maxsimRetrieval]] since both rank with the
    * identical e6 kernel. */
  def maxsimRetrievalLsh(s: SparkSession, dir: String, k: Int = 5,
      probeBits: Int = 2): DataFrame =
    maxsimLshFromChunks(TextOps.chunkVectors(s, dir), k, probeBits)

  /** Bucketed core on any chunk-vector frame; `planes` parameterizes the
    * hyperplane count (the keyed query pins [[TextOps.DocPlanes]]; at a
    * grown corpus ScaleProbe sizes planes by log₂ growth, holding
    * per-bucket chunk occupancy — and so candidate volume per query —
    * flat, the adaptive rule the doc-level leg already lands). */
  private[graft] def maxsimLshFromChunks(cv: DataFrame, k: Int = 5,
      probeBits: Int = 2, planes: Int = TextOps.DocPlanes,
      qPred: Column = col("doc_id") % SimilarityOps.QueryModulus === 0): DataFrame =
    maxsimFromBucketedChunks(
      cv.withColumn("bucket", TextOps.docLshBucketN(col("v"), planes)),
      k, probeBits, planes, qPred)

  /** Same core over an ALREADY-BUCKETED chunk frame — the landed-index
    * probe path (bucket assignment is a pure function of v, so landed
    * and inline buckets are bit-identical; the landed artifact exists
    * to skip the re-hash and to prune file reads by bucket). */
  private[graft] def maxsimFromBucketedChunks(e: DataFrame, k: Int = 5,
      probeBits: Int = 2, planes: Int = TextOps.DocPlanes,
      qPred: Column = col("doc_id") % SimilarityOps.QueryModulus === 0): DataFrame = {
    val probes = array(
      SimilarityOps.probeMasks(probeBits, planes).map(lit): _*)
    val q = e.filter(qPred)
      .select(col("doc_id").as("q_doc"), col("chunk_id").as("q_chunk"),
        col("v").as("qv"), col("nrm").as("qn"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    // no pair-grain dedup needed: an n_chunk has ONE bucket and a query
    // chunk's probe buckets are pairwise-distinct values, so a
    // (q_chunk, n_chunk) pair collides in at most one probed bucket
    val pairs = e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_doc") =!= col("doc_id"))
      .select(col("q_doc"), col("q_chunk"), col("doc_id").as("n_doc"),
        chunkSimE6.as("sim_e6"))
    maxsimRank(pairs, k)
  }

  /** Exact-integer e6 chunk-pair cosine (the chunk_neighbors kernel with
    * the floor-to-e6 edge): long dot over the hashed int vectors, ONE
    * double division, floored before any reduction. */
  private def chunkSimE6: Column = {
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    floor(dot.cast("double") /
      (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double")))
      * lit(1e6) + lit(0.5))
  }

  /** Shared MaxSim reduction: max per (q_chunk, n_doc) → sum per (q_doc,
    * n_doc) → top-k docs per query. */
  private def maxsimRank(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_doc").orderBy(col("maxsim_e6").desc, col("n_doc"))
    pairs
      .groupBy("q_doc", "q_chunk", "n_doc").agg(max("sim_e6").as("best_e6"))
      .groupBy("q_doc", "n_doc")
      .agg(sum("best_e6").as("maxsim_e6"), count(lit(1)).as("n_q_chunks"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_doc", "n_doc", "maxsim_e6", "n_q_chunks", "rnk")
      .orderBy("q_doc", "rnk")
  }
}
