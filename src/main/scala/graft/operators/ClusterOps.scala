package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.VectorFunctions.{dotE12, normE12}

/** Exact distributed k-means (Lloyd's algorithm) and everything built
  * on it: SemDeDup semantic dedup (batch / incremental / streaming
  * kernel), product quantization + the ADC scan, and the composed
  * IVF-PQ — SURVEY.md §2 #30f–i / #28c–d.
  *
  * This is the ONE quantizer story: every kmeans consumer — including
  * [[SimilarityOps.annIvf]]'s coarse cells since round 9 — trains
  * through [[kmeansCentroids]], the exact-arithmetic Lloyd's:
  * e6-quantized integer
  * components, integer squared distances, argmin with a total-order
  * tie-break, and round-half-up integer centroid updates — every round a
  * pure function of the input, so the DuckDB oracle UNROLLS the same
  * rounds (the graph_pagerank / bpe_merges trick) and the final
  * assignment hash-matches bit-for-bit.
  *
  * Scale shape (the distributed-kmeans standard): per round, assignment
  * is a map-side broadcast of k centroids (k rows — never a shuffle of
  * the corpus), and the update is ONE (cluster, dim) partial-agg shuffle
  * whose width is k×dims groups regardless of corpus size. At 10⁹
  * vectors the only corpus-proportional cost is the scan per round;
  * production sizing raises k with √corpus exactly as annIvf documents.
  */
object ClusterOps {

  /** Cluster count / Lloyd rounds — fixed so the oracle can unroll. */
  val KmeansK = 4
  val KmeansRounds = 3

  private def v6(x: Column): Column =
    floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long")

  /** e6-quantized embedding frame (vec_id, v: array<long>) — the shared
    * integer domain both engines compute distances in. `lo` (1-based) +
    * `len` carve out a subspace slice for product quantization; the
    * default covers the full vector. With `normalize`, components are
    * e6 integers of the UNIT vector (x·10¹²/√nrmE12, one exact-int
    * norm + two correctly-rounded double ops, mirrored in the oracle):
    * the cosine-metric convention for PQ — on unit vectors L2² is
    * monotone in cosine (2−2cos), so ADC ranks by similarity instead
    * of being distorted by raw norms. */
  private[operators] def quantized(emb: DataFrame, lo: Int = 1, len: Int = 64,
      normalize: Boolean = false): DataFrame =
    if (!normalize)
      emb.select(col("vec_id").cast("long").as("vec_id"),
        transform(slice(col("embedding"), lo, len), v6 _).as("v"))
    else {
      // nrm is MATERIALIZED as its own projection before the lambda (the
      // winnowing lesson: a non-trivial expression referenced inside a
      // higher-order function re-evaluates per element; an attribute
      // read does not)
      emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
          normE12(col("embedding")).as("nrm"))
        .select(col("vec_id"),
          transform(slice(col("embedding"), lo, len),
            x => floor(x.cast("double") * lit(1000000000000.0) /
              sqrt(col("nrm").cast("double")) + lit(0.5)).cast("long")).as("v"))
    }

  /** Exact integer squared L2 distance between two e6 long arrays. */
  private[operators] def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Argmin assignment of every vector to its nearest centroid:
    * broadcast the k-row centroid frame, score k candidates per vector
    * map-side, keep min(struct(dist, cluster)) — the struct min IS the
    * total-order argmin (distance, then lowest cluster id), so ties are
    * deterministic in both engines. */
  private[operators] def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        struct(dist2(col("v"), col("c")).as("d"), col("cluster")).as("dc"))
      .groupBy("vec_id")
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"), col("m.d").as("dist2"))

  /** embedding_kmeans — exact Lloyd's iterations over the embeddings
    * table. Init: centroids = the vectors with vec_id 0..k−1 (data-
    * deterministic, no RNG). Each round: argmin assignment, then the
    * centroid update c'_d = floor(Σv_d / n + 0.5) in e6 integers (the
    * double division of two exact integers is correctly rounded and
    * identical in DuckDB); a cluster that captures no vectors keeps its
    * previous centroid. Output: the final assignment (vec_id, cluster,
    * exact integer dist2) — all BIGINT, hash-exact vs the unrolled
    * oracle. */
  def embeddingKmeans(s: SparkSession, dir: String): DataFrame =
    kmeansAssign(Tables.embeddings(s, dir), KmeansK, KmeansRounds)

  /** Lloyd training loop on an already-quantized frame: returns the final
    * (cluster, c) centroid frame. Separated from [[kmeansAssign]] so the
    * incremental path can FREEZE centroids trained on the corpus and
    * assign a new batch against them without retraining. */
  private[graft] def kmeansCentroids(train: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var cent = train.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("v").as("c"))
      // k tiny rows; keeps every round's lineage flat. LAZY (eager=false):
      // an eager checkpoint is one full job per call site, which the
      // M-subspace PQ loop pays M times before any real work — lazy
      // materializes inside the first consuming job instead
      .localCheckpoint(false)
    var r = 0
    while (r < rounds) {
      val a = assign(train, cent).select("vec_id", "cluster")
      // ONE (cluster, dim) partial-agg shuffle: k×dims groups whatever
      // the corpus size. Rebuild the centroid array deterministically
      // with an in-group sort by dim (bounded: dims elements).
      val upd = a.join(train, "vec_id")
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(floor(sum(col("x")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("cn"))
      // Empty clusters keep their previous centroid (oracle mirrors with
      // a LEFT JOIN + coalesce). Checkpoint every SECOND round only (the
      // graph_pagerank lesson): each eager checkpoint is a full job whose
      // fixed overhead dominates at k-row state size, while two rounds of
      // join+agg lineage re-plan cheaply.
      val next = cent.join(upd, Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("cn"), col("c")).as("c"))
      cent = if (r % 2 == 1 && r != rounds - 1) next.localCheckpoint() else next
      r += 1
    }
    cent
  }

  /** Core on any (vec_id, embedding) frame — lets ScaleProbe grow the
    * corpus; also the cluster source for [[semanticDedup]]. */
  def kmeansAssign(emb: DataFrame, k: Int = KmeansK,
      rounds: Int = KmeansRounds): DataFrame = {
    // Persisted: consumed k+1 times per round (assignment probe + update
    // join) across `rounds` rounds; without the persist every pass
    // re-reads parquet and re-quantizes. Cache contract as elsewhere:
    // callers clear after consuming (Verify/Bench clearCache per query).
    val e = quantized(emb).persist(StorageLevel.MEMORY_AND_DISK)
    assign(e, kmeansCentroids(e, k, rounds)).orderBy("vec_id")
  }

  /** Pairwise-cosine threshold shared with dedup_embedding (SURVEY §7:
    * corpus max pairwise cos ≈ 0.47, so 0.35 marks true near-dups). */
  val SemThreshold = 0.35

  /** semantic_dedup — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space, then deduplicate ONLY within clusters —
    * a doc is dropped iff some LOWER-id doc in its own cluster has
    * cosine ≥ τ (first-wins, the dedup_exact keep convention). The
    * cluster partition turns the all-pairs O(n²) cosine pass into
    * Σ|cluster|² work on a cluster-keyed EQUI-join — with production
    * k ≈ √n that is O(n^1.5) total and embarrassingly parallel, the
    * published recipe for semantic dedup at 10⁸+ docs. Output: one
    * verdict row per vector (cluster, dup_of = lowest matching id or
    * null, keep) — fully oracle-checked: the kmeans rounds unroll and
    * the cosine is the exact-int dotE12 chain dedup_embedding uses.
    *
    * vs dedup_embedding: same similarity, but (a) bounded candidate
    * generation via the learned partition instead of brute all-pairs,
    * and (b) per-doc KEEP VERDICTS (the curation decision) rather than
    * a pair list. A near-dup pair split across cluster boundaries is
    * missed by design — that recall/cost trade is the SemDeDup
    * contract and RecallSpec records it against the brute baseline. */
  def semanticDedup(s: SparkSession, dir: String,
      threshold: Double = SemThreshold): DataFrame =
    semanticDedupFrom(Tables.embeddings(s, dir), threshold)

  def semanticDedupFrom(emb: DataFrame, threshold: Double = SemThreshold,
      k: Int = KmeansK, rounds: Int = KmeansRounds): DataFrame = {
    val a = kmeansAssign(emb, k, rounds).select("vec_id", "cluster")
    val e = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        normE12(col("embedding")).as("nrm"))
      .join(a, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the pair join
    val dup = e.as("x").join(e.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("y.vec_id") < col("x.vec_id"))
      .where(DedupOps.cosine(dotE12(col("x.embedding"), col("y.embedding")),
        col("x.nrm"), col("y.nrm")) >= threshold)
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(min(col("y.vec_id")).as("dup_of"))
    e.select("vec_id", "cluster").join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** Product-quantization geometry: M subspaces × `PqK`-entry codebooks,
    * `PqRounds` Lloyd rounds each — fixed so the oracle can unroll all
    * M×rounds stages. 64 dims / 4 subspaces = 16 dims per code. */
  val PqM = 4
  val PqK = 16
  val PqRounds = 2

  /** embedding_pq — PRODUCT QUANTIZATION (Jégou et al. 2011, the
    * IVF-PQ compression FAISS ships): the vector splits into M
    * contiguous subspaces, each learns its own tiny k-means codebook,
    * and a vector compresses to M small codes — here 64 floats → 4
    * codes (2 bits each at k=4; production uses 8-bit codes × 8–64
    * subspaces for 32–512× compression). `err` is the EXACT integer
    * reconstruction error Σ_m d²(slice_m, codebook_m[code_m]) — the
    * quantization-quality metric you monitor before trusting
    * asymmetric-distance search, where a query scans M lookup tables
    * of k entries instead of raw vectors. Same per-round plan shape as
    * [[embeddingKmeans]] ×M (broadcast assignment + k×dims-group
    * update shuffle), and the M loops share ONE persisted scan of the
    * table. Fully oracle-checked: the DuckDB twin unrolls all M
    * per-subspace kmeans instances and joins their final assignments. */
  def embeddingPq(s: SparkSession, dir: String): DataFrame =
    embeddingPqFrom(Tables.embeddings(s, dir))

  def embeddingPqFrom(emb: DataFrame, m: Int = PqM, k: Int = PqK,
      rounds: Int = PqRounds): DataFrame = {
    val dimsPer = 64 / m
    // ONE normalized scan persisted; every subspace slices from it
    // (M separate quantized() calls would re-read parquet M times)
    val qAll = quantized(emb, normalize = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val subs = (0 until m).map { i =>
      val q = qAll.select(col("vec_id"),
        slice(col("v"), i * dimsPer + 1, dimsPer).as("v"))
      assign(q, kmeansCentroids(q, k, rounds))
        .select(col("vec_id"), col("cluster").as(s"c$i"),
          col("dist2").as(s"d$i"))
    }
    val joined = subs.reduce((a, b) => a.join(b, "vec_id"))
    joined.select(
        col("vec_id") +: (0 until m).map(i => col(s"c$i")) :+
          (0 until m).map(i => col(s"d$i")).reduce(_ + _).as("err"): _*)
      .orderBy("vec_id")
  }

  /** ann_pq — ASYMMETRIC-DISTANCE search over PQ codes (the ADC scan of
    * Jégou 2011): each query precomputes one lookup table per subspace —
    * its exact integer distance to every codebook entry (M×k values, a
    * broadcast-sized frame) — and a corpus vector scores as the SUM of M
    * table lookups keyed by its codes, never touching raw floats. This
    * is where PQ pays: the corpus side streams 4 BIGINT codes per row
    * (vs 64 floats), the per-row work is M map-side lookups via a
    * broadcast equi-join on (subspace, code), and the only shuffle is
    * the (q_id, n_id) partial agg + per-query top-k. ADC scans every
    * code by design (IVF-PQ composes [[SimilarityOps.annIvf]]'s cell
    * pruning in front); ranking quality vs exact cosine is recall-spec
    * business, determinism is exact — adist is an integer and ties
    * break on n_id, so output hash-matches the oracle built on the same
    * unrolled codebooks. */
  def annPq(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    annPqFrom(Tables.embeddings(s, dir), k)

  def annPqFrom(emb: DataFrame, topK: Int = 5, m: Int = PqM,
      k: Int = PqK, rounds: Int = PqRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dimsPer = 64 / m
    // same shared-scan layout as embeddingPqFrom
    val qAll = quantized(emb, normalize = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val parts = (0 until m).map { i =>
      val q = qAll.select(col("vec_id"),
        slice(col("v"), i * dimsPer + 1, dimsPer).as("v"))
      // TWO consumers (corpus codes + query LUT) — checkpoint the k-row
      // codebook so the training lineage isn't duplicated into both
      val cent = kmeansCentroids(q, k, rounds).localCheckpoint()
      val codes = assign(q, cent)
        .select(col("vec_id").as("n_id"), col("cluster").as("code"))
      val lut = q.filter(SimilarityOps.isQuery(col("vec_id")))
        .crossJoin(broadcast(cent))
        .select(col("vec_id").as("q_id"), col("cluster").as("code"),
          dist2(col("v"), col("c")).as("d"))
      codes.join(broadcast(lut), Seq("code"))
        .filter(col("q_id") =!= col("n_id"))
        .select("q_id", "n_id", "d")
    }
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("n_id"))
    parts.reduce(_ unionByName _)
      .groupBy("q_id", "n_id").agg(sum(col("d")).cast("long").as("adist"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .orderBy("q_id", "rnk")
  }

  /** Coarse-quantizer geometry for [[annIvfPq]] — fixed for the oracle. */
  val CoarseCells = 8
  val CoarseRounds = 2
  val PqNprobe = 2

  /** ann_ivf_pq — the COMPOSED production ANN (FAISS IVF-PQ): an exact
    * coarse k-means quantizer partitions the corpus into cells, each
    * query probes its `nprobe` nearest cells, and the ADC scan runs
    * ONLY over the probed cells' members. This is the operator that
    * discharges ann_pq's |Q|·n scan at scale: scanned fraction ≈
    * nprobe/cells (here 2/8; production √n cells make it vanish as the
    * corpus grows, the annIvf sizing rule), and the per-candidate cost
    * is still M integer lookups. Same argmin/centroid arithmetic as
    * every kmeans here, so the whole composition — coarse cells, probe
    * choice, codes, LUT sums, top-k — is bit-exact vs the oracle's
    * unrolled twin (coarse + M subspace instances in one WITH). */
  def annIvfPq(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    annIvfPqFrom(Tables.embeddings(s, dir), k)

  def annIvfPqFrom(emb: DataFrame, topK: Int = 5, cells: Int = CoarseCells,
      crounds: Int = CoarseRounds, nprobe: Int = PqNprobe, m: Int = PqM,
      k: Int = PqK, rounds: Int = PqRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dimsPer = 64 / m
    val qAll = quantized(emb, normalize = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // coarse quantizer: cells over the FULL normalized vector
    val coarseCent = kmeansCentroids(qAll, cells, crounds).localCheckpoint()
    val cellOf = assign(qAll, coarseCent)
      .select(col("vec_id").as("n_id"), col("cluster").as("cell"))
    val w0 = Window.partitionBy("q_id").orderBy(col("cd"), col("cell"))
    val probed = qAll.filter(SimilarityOps.isQuery(col("vec_id")))
      .crossJoin(broadcast(coarseCent))
      .select(col("vec_id").as("q_id"), col("cluster").as("cell"),
        dist2(col("v"), col("c")).as("cd"))
      .withColumn("pr", row_number().over(w0)).filter(col("pr") <= nprobe)
      .select("q_id", "cell")
    // candidate pairs: corpus members of the probed cells — consumed by
    // all M subspace joins, so cut the coarse lineage once
    val cand = probed.join(cellOf, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .localCheckpoint()
    val parts = (0 until m).map { i =>
      val q = qAll.select(col("vec_id"),
        slice(col("v"), i * dimsPer + 1, dimsPer).as("v"))
      val cent = kmeansCentroids(q, k, rounds).localCheckpoint()
      val codes = assign(q, cent)
        .select(col("vec_id").as("n_id"), col("cluster").as("code"))
      val lut = q.filter(SimilarityOps.isQuery(col("vec_id")))
        .crossJoin(broadcast(cent))
        .select(col("vec_id").as("q_id"), col("cluster").as("code"),
          dist2(col("v"), col("c")).as("d"))
      cand.join(codes, Seq("n_id"))
        .join(broadcast(lut), Seq("q_id", "code"))
        .select("q_id", "n_id", "d")
    }
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("n_id"))
    parts.reduce(_ unionByName _)
      .groupBy("q_id", "n_id").agg(sum(col("d")).cast("long").as("adist"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .orderBy("q_id", "rnk")
  }

  /** semantic_dedup_text — the FULL corpus loop a 100 TB pipeline runs:
    * documents → hashed embeddings ([[TextOps.docEmbed]]'s signed
    * feature hashing) → SemDeDup keep verdicts, with NO external
    * embeddings table. The kmeans partition and the within-cluster
    * cosine both run in pure integer arithmetic on the hashed count
    * vectors (integer dot products and squared norms; the only doubles
    * are the final cos ratio, one mirrored op sequence — the
    * doc_neighbors convention), so the whole composition — XXH64
    * hashing, vector build, unrolled kmeans rounds, verdicts — is
    * oracle-checked end to end. Zero-norm docs are excluded by the
    * bridge frame. Output: one verdict row per doc (cluster, dup_of =
    * lowest same-cluster doc at cos ≥ τ, keep). */
  def semanticDedupText(s: SparkSession, dir: String,
      threshold: Double = SemThreshold, k: Int = KmeansK,
      rounds: Int = KmeansRounds): DataFrame = {
    // persisted: feeds kmeans training (k+1 consumers/round) AND both
    // sides of the pair join; the vector build re-runs XXH64 over every
    // token otherwise
    val fv = TextOps.docEmbedVectors(s, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ints = fv.select("vec_id", "v")
    val cent = kmeansCentroids(ints, k, rounds)
    val assigned = assign(ints, cent).select("vec_id", "cluster")
    val e = fv.join(assigned, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dot = aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b),
      lit(0L), (acc, d) => acc + d)
    val dup = e.as("x").join(e.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("y.vec_id") < col("x.vec_id"))
      .where(dot.cast("double") / (sqrt(col("x.nrm").cast("double")) *
        sqrt(col("y.nrm").cast("double"))) >= threshold)
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(min(col("y.vec_id")).as("dup_of"))
    e.select("vec_id", "cluster").join(dup, Seq("vec_id"), "left")
      .select(col("vec_id").as("doc_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy("doc_id")
  }

  /** Corpus/batch split for [[semanticDedupIncremental]] — shared with
    * the exact and minhash incremental paths (one ingest convention,
    * mirrored verbatim in the oracle). */
  val SemSplit: Long = DedupOps.IncrementalSplit

  /** semantic_dedup_incremental — the INGEST shape of SemDeDup,
    * completing the admission-control family (dedup_incremental = exact
    * hash, dedup_minhash_incremental = fuzzy text, this = embedding
    * space): a new batch (vec_id ≥ split) is screened against the
    * already-ingested corpus and earlier docs of the same batch, with
    * the k-means quantizer FROZEN on the corpus — exactly how
    * production runs it (the quantizer is an artifact of the last full
    * build; daily ingestion assigns against it, it never retrains).
    *
    * Scale shape: the corpus NEVER re-pairs with itself — batch docs
    * equi-join only the same-cluster corpus slice (at production
    * k ≈ √corpus that is O(batch·√corpus) candidate work), and the
    * in-batch pass is batch-sized. Per-doc verdicts mirror the other
    * incrementals: dup_of_corpus / dup_in_batch / keep. Fully
    * oracle-checked: the unrolled kmeans twin trains on the corpus
    * subset and assigns everyone. */
  def semanticDedupIncremental(s: SparkSession, dir: String,
      threshold: Double = SemThreshold): DataFrame =
    semanticDedupIncrementalFrom(Tables.embeddings(s, dir), SemSplit, threshold)

  def semanticDedupIncrementalFrom(emb: DataFrame, split: Long,
      threshold: Double = SemThreshold, k: Int = KmeansK,
      rounds: Int = KmeansRounds): DataFrame = {
    val q = quantized(emb).persist(StorageLevel.MEMORY_AND_DISK)
    val cent = kmeansCentroids(q.filter(col("vec_id") < split), k, rounds)
    val assigned = assign(q, cent).select("vec_id", "cluster")
    val e = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        normE12(col("embedding")).as("nrm"))
      .join(assigned, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK) // corpus + both batch sides
    semanticVerdicts(e.filter(col("vec_id") >= split),
      e.filter(col("vec_id") < split), threshold)
  }

  /** The admission verdict kernel on pre-assigned frames — shared by
    * [[semanticDedupIncremental]] and the streaming landing path
    * ([[graft.streaming.EventStreams.landSemanticAdmissionStream]]).
    * Both sides carry (vec_id, embedding, nrm, cluster). Self-pairs are
    * dropped as defense in depth against an at-least-once replay where
    * a batch vector already reached the index (the admissionAgainstIndex
    * convention). */
  private[graft] def semanticVerdicts(batchE: DataFrame, corpusE: DataFrame,
      threshold: Double): DataFrame = {
    def near(x: String, y: String): Column =
      DedupOps.cosine(dotE12(col(s"$x.embedding"), col(s"$y.embedding")),
        col(s"$x.nrm"), col(s"$y.nrm")) >= threshold
    val candCorpus = batchE.as("x").join(corpusE.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .where(near("x", "y"))
      .select(col("x.vec_id").as("vec_id"), lit(true).as("from_corpus"))
    // the EARLIER batch doc is the blocker (first-in-batch-wins, the
    // dedupIncremental convention)
    val candBatch = batchE.as("x").join(batchE.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("y.vec_id") < col("x.vec_id"))
      .where(near("x", "y"))
      .select(col("x.vec_id").as("vec_id"), lit(false).as("from_corpus"))
    val perDoc = candCorpus.unionByName(candBatch)
      .groupBy("vec_id")
      .agg(max(col("from_corpus")).as("dup_of_corpus"),
        max(!col("from_corpus")).as("dup_in_batch"))
    batchE.select("vec_id", "cluster").join(perDoc, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup_of_corpus"), lit(false)).as("dup_of_corpus"),
        coalesce(col("dup_in_batch"), lit(false)).as("dup_in_batch"),
        (!coalesce(col("dup_of_corpus"), lit(false)) &&
          !coalesce(col("dup_in_batch"), lit(false))).as("keep"))
      .orderBy("vec_id")
  }

  /** Attach (nrm, cluster) to a raw (vec_id, embedding) frame against a
    * FROZEN centroid frame — the assignment step of the streaming path. */
  private[graft] def assignAgainst(emb: DataFrame, cent: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        normE12(col("embedding")).as("nrm"))
      .join(assign(quantized(emb), cent).select("vec_id", "cluster"), "vec_id")

  /** Land the frozen semantic-admission artifacts: the corpus-trained
    * quantizer (`centroids`) and the assigned corpus index (`index`) —
    * what a production build job writes once so the ingest stream only
    * assigns and probes. */
  def initSemanticIndex(corpus: DataFrame, baseDir: String,
      k: Int = KmeansK, rounds: Int = KmeansRounds): Unit = {
    val q = quantized(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val cent = kmeansCentroids(q, k, rounds).localCheckpoint()
    cent.write.mode("overwrite").parquet(s"$baseDir/centroids")
    assignAgainst(corpus, cent)
      .write.mode("overwrite").parquet(s"$baseDir/index")
    corpus.sparkSession.catalog.clearCache()
  }
}
