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

  /** The e6 quantization of an embedding column as a reusable expression
    * (the [[quantized]] lambda) — lets consumers attach `v` to a wider
    * frame instead of joining two scans of the same table on vec_id. */
  private[operators] def v6Arr(emb: Column): Column =
    transform(slice(emb, 1, 64), v6 _)

  /** The k-row centroid frame collapsed to ONE cluster-ascending
    * array-of-structs row — the broadcastable "model" every map-side
    * argmin / probe / ADC-LUT consumer reads. (array_sort on
    * struct(cluster, c) sorts by cluster first; the order only needs to
    * be deterministic, argmin and map lookups are order-insensitive.) */
  private[operators] def centArray(cent: DataFrame): DataFrame =
    cent.agg(array_sort(collect_list(struct(col("cluster"), col("c"))))
      .as("cents"))

  /** (dist2, cluster) argmin struct of vector `v` over a centroid-array
    * column — array_min's struct ordering IS the (distance, then lowest
    * cluster id) total order the old min(struct) aggregation used, so
    * ties are deterministic in both engines. */
  private[operators] def argminStruct(v: Column, cents: Column): Column =
    array_min(transform(cents,
      ct => struct(dist2(v, ct.getField("c")).as("d"),
        ct.getField("cluster").as("cluster"))))

  /** Argmin assignment of every vector to its nearest centroid — computed
    * entirely MAP-SIDE (guide §2.4, "remove shuffles outright"): the
    * k-row centroid frame collapses to one broadcast array row and every
    * vector reduces its k (dist, cluster) structs with array_min. The
    * previous shape (crossJoin with the k-row frame + groupBy(vec_id)
    * min) paid one corpus-sized exchange PER CALL — once per Lloyd round
    * per consumer; this pays zero. Same arithmetic, same total-order
    * tie-break, bit-identical output. */
  private[operators] def assign(e: DataFrame, cent: DataFrame): DataFrame =
    assignKeep(e, cent).select("vec_id", "cluster", "dist2")

  /** [[assign]] keeping every input column of `e` — being map-side it
    * can carry the caller's payload through, so consumers that used to
    * join the assignment back on vec_id (one more corpus shuffle) now
    * read one projection. */
  private[operators] def assignKeep(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(centArray(cent)))
      .withColumn("__m", argminStruct(col("v"), col("cents")))
      .select(e.columns.map(col) :+ col("__m.cluster").as("cluster") :+
        col("__m.d").as("dist2"): _*)

  /** Explode each row of `q` into its top-`nprobe` nearest cells by exact
    * integer L2 against `cent` — map-side: array_sort over the
    * (cd, cell) structs is the same total order the old per-query
    * row_number window used, without the |Q|·cells exchange the window
    * paid. Keeps every input column of `q`, appends `cell`. */
  private[operators] def probeCellsKeep(q: DataFrame, cent: DataFrame,
      nprobe: Int): DataFrame =
    q.crossJoin(broadcast(centArray(cent)))
      .withColumn("cell", explode(transform(
        slice(array_sort(transform(col("cents"), ct =>
          struct(dist2(col("v"), ct.getField("c")).as("cd"),
            ct.getField("cluster").as("cell")))), 1, nprobe),
        pc => pc.getField("cell"))))
      .select(q.columns.map(col) :+ col("cell"): _*)

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
      // ONE (cluster, dim) partial-agg shuffle: k×dims groups whatever
      // the corpus size. The map-side assignKeep carries `v` through, so
      // the old per-round assignment⋈train join on vec_id (a second
      // corpus exchange per round) is gone. Rebuild the centroid array
      // deterministically with an in-group sort by dim (bounded: dims
      // elements).
      val upd = assignKeep(train, cent)
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

  /** Lloyd training for SEVERAL independent kmeans instances in ONE
    * round loop: `train` is (vec_id, sub, v) with `sub` keying the
    * instance (one per PQ subspace, optionally the coarse quantizer as
    * sub = −1) and `kOf` each instance's cluster count. Per round the
    * work is ONE broadcast join + ONE (sub, cluster, dim) partial-agg
    * shuffle covering ALL instances — M separate [[kmeansCentroids]]
    * loops previously paid M× the per-round fixed cost (guide §1.2:
    * fix the distributed algorithm first). Instances never interact
    * (every group key carries `sub`), and init / argmin / update /
    * empty-cluster rules are [[kmeansCentroids]]' verbatim, so the
    * returned (sub, cluster, c) table is bit-identical to training each
    * instance alone — the per-subspace unrolled oracles are untouched.
    * Eagerly checkpointed: one job runs the whole training and every
    * downstream consumer (codes, LUTs, artifact sinks) reads the tiny
    * cached result. */
  private[graft] def kmeansCentroidsMulti(train: DataFrame,
      kOf: Map[Int, Int], rounds: Int): DataFrame = {
    val kMap = map(kOf.toSeq.sortBy(_._1).flatMap { case (sb, kk) =>
      Seq(lit(sb), lit(kk.toLong)) }: _*)
    var cent = train.filter(col("vec_id") < element_at(kMap, col("sub")))
      .select(col("sub"), col("vec_id").as("cluster"), col("v").as("c"))
      .localCheckpoint(false)
    var r = 0
    while (r < rounds) {
      val centsBySub = cent.groupBy("sub")
        .agg(array_sort(collect_list(struct(col("cluster"), col("c"))))
          .as("cents"))
      val upd = train.join(broadcast(centsBySub), Seq("sub"))
        .select(col("sub"),
          argminStruct(col("v"), col("cents")).getField("cluster")
            .as("cluster"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("sub", "cluster", "pos")
        .agg(floor(sum(col("x")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("m"))
        .groupBy("sub", "cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("cn"))
      val next = cent.join(upd, Seq("sub", "cluster"), "left")
        .select(col("sub"), col("cluster"), coalesce(col("cn"), col("c")).as("c"))
      cent = if (r % 2 == 1 && r != rounds - 1) next.localCheckpoint() else next
      r += 1
    }
    cent.localCheckpoint()
  }

  /** The M-subspace PQ training frame: one row per (vector, subspace)
    * slice — plus the full vector as sub = −1 when `withCoarse`, so the
    * coarse quantizer trains in the same loop. */
  private[operators] def pqTrainFrame(qAll: DataFrame, m: Int, dimsPer: Int,
      withCoarse: Boolean): DataFrame = {
    val slices = (0 until m).map(i =>
      struct(lit(i).as("sub"), slice(col("v"), i * dimsPer + 1, dimsPer).as("v")))
    val all = if (withCoarse)
      struct(lit(-1).as("sub"), col("v").as("v")) +: slices else slices
    qAll.select(col("vec_id"), explode(array(all: _*)).as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.v").as("v"))
  }

  /** The (sub, cluster, c) multi-training result collapsed to ONE model
    * row: a `cents$i` array per subspace (plus `ccents` for sub = −1
    * when present) — conditional collect_list skips nulls, array_sort
    * makes the layout deterministic. One aggregation over the tiny
    * checkpointed centroid table. */
  private[operators] def pqModelRow(centMulti: DataFrame, m: Int,
      withCoarse: Boolean): DataFrame = {
    val subs = (0 until m).map(i =>
      array_sort(collect_list(when(col("sub") === i,
        struct(col("cluster"), col("c"))))).as(s"cents$i"))
    val aggs = if (withCoarse)
      array_sort(collect_list(when(col("sub") === -1,
        struct(col("cluster"), col("c"))))).as("ccents") +: subs
    else subs
    centMulti.agg(aggs.head, aggs.tail: _*)
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
    // ONE scan carries embedding + norm + the quantized training vector,
    // so the final assignment attaches map-side — the old shape joined a
    // separately-shuffled kmeansAssign output back on vec_id
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"), normE12(col("embedding")).as("nrm"),
        v6Arr(col("embedding")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK) // training rounds re-read it
    val cent = kmeansCentroids(base.select("vec_id", "v"), k, rounds)
    val e = assignKeep(base, cent).drop("v", "dist2")
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
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    // ALL M codebooks train in ONE round loop (kmeansCentroidsMulti) and
    // collapse into ONE broadcast model row; codes + reconstruction
    // errors for all M subspaces are a single map-side projection. The
    // old shape trained M separate loops (M× the per-round stages),
    // assigned each subspace separately (M corpus shuffles) and
    // re-joined the M outputs on vec_id (M−1 more) — this plan has ZERO
    // corpus exchanges after training (guide §2.4; measured 154
    // Exchange → see plans/r13/).
    val centMulti = kmeansCentroidsMulti(
      pqTrainFrame(qAll, m, dimsPer, withCoarse = false),
      (0 until m).map(i => i -> k).toMap, rounds)
    val model = pqModelRow(centMulti, m, withCoarse = false)
    qAll.crossJoin(broadcast(model))
      .select(col("vec_id") +: (0 until m).map(i =>
        argminStruct(sub(i), col(s"cents$i")).as(s"m$i")): _*)
      .select(
        col("vec_id") +: (0 until m).map(i => col(s"m$i.cluster").as(s"c$i")) :+
          (0 until m).map(i => col(s"m$i.d")).reduce(_ + _).as("err"): _*)
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
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    // ALL M codebooks train in ONE round loop; the checkpointed multi
    // result serves both consumers (corpus codes + query LUTs) so the
    // training lineage runs once, not once per consumer
    val model = pqModelRow(
      kmeansCentroidsMulti(pqTrainFrame(qAll, m, dimsPer, withCoarse = false),
        (0 until m).map(i => i -> k).toMap, rounds),
      m, withCoarse = false)
    // corpus codes: all M argmins in one map-side projection (the old
    // shape shuffled each subspace's assignment separately)
    val codes = qAll.crossJoin(broadcast(model))
      .select(col("vec_id").as("n_id") +: (0 until m).map(i =>
        argminStruct(sub(i), col(s"cents$i")).getField("cluster")
          .as(s"c$i")): _*)
    // per-query ADC tables as M (code → dist²) MAP columns: one
    // broadcast row per query replaces M per-subspace (q_id, code) join
    // legs + the M-way union + the (q_id, n_id) re-aggregation shuffle —
    // adist is now a pure map-side sum of M lookups, and the only
    // remaining exchange is the per-query top-k window (guide §2.4).
    val qlut = qAll.filter(SimilarityOps.isQuery(col("vec_id")))
      .crossJoin(broadcast(model))
      .select(col("vec_id").as("q_id") +: (0 until m).map(i =>
        map_from_entries(transform(col(s"cents$i"), ct =>
          struct(ct.getField("cluster"), dist2(sub(i), ct.getField("c")))))
          .as(s"lut$i")): _*)
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("n_id"))
    codes.join(broadcast(qlut), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(i => element_at(col(s"lut$i"), col(s"c$i")))
          .reduce(_ + _).as("adist"))
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
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    // coarse quantizer (cells over the FULL normalized vector) + M
    // subspace codebooks → ONE broadcast model row. When the round
    // counts agree (they do at the keyed defaults) all M+1 instances
    // train in ONE round loop (sub = −1 carries the full vector); the
    // checkpointed multi result serves both the corpus and query sides,
    // so training runs once, not once per consumer.
    val model = if (crounds == rounds) {
      pqModelRow(
        kmeansCentroidsMulti(pqTrainFrame(qAll, m, dimsPer, withCoarse = true),
          (0 until m).map(i => i -> k).toMap + (-1 -> cells), rounds),
        m, withCoarse = true)
    } else {
      (centArray(kmeansCentroids(qAll, cells, crounds))
          .select(col("cents").as("ccents")) +:
        (0 until m).map { i =>
          centArray(kmeansCentroids(
              qAll.select(col("vec_id"), sub(i).as("v")), k, rounds))
            .select(col("cents").as(s"cents$i"))
        }).reduce(_ crossJoin _).localCheckpoint()
    }
    // corpus side: cell + all M codes in ONE map-side projection (the
    // old shape paid a coarse-assignment shuffle, a probed⋈cellOf
    // exchange, a checkpoint, and M code joins keyed on n_id)
    val codes = qAll.crossJoin(broadcast(model))
      .select(col("vec_id").as("n_id") +:
        argminStruct(col("v"), col("ccents")).getField("cluster").as("cell") +:
        (0 until m).map(i =>
          argminStruct(sub(i), col(s"cents$i")).getField("cluster")
            .as(s"c$i")): _*)
    // query side: top-nprobe probed cells (array_sort = the (cd, cell)
    // tie-break the old window used) + the M ADC LUT maps, one map-side
    // projection, exploded per probed cell and broadcast — the per-pair
    // adist is a pure map-side sum of M lookups and the only remaining
    // exchange is the per-query top-k window.
    val probes = qAll.filter(SimilarityOps.isQuery(col("vec_id")))
      .crossJoin(broadcast(model))
      .select(col("vec_id").as("q_id") +:
        transform(slice(array_sort(transform(col("ccents"), ct =>
          struct(dist2(col("v"), ct.getField("c")).as("cd"),
            ct.getField("cluster").as("cell")))), 1, nprobe),
          pc => pc.getField("cell")).as("pcells") +:
        (0 until m).map(i =>
          map_from_entries(transform(col(s"cents$i"), ct =>
            struct(ct.getField("cluster"), dist2(sub(i), ct.getField("c")))))
            .as(s"lut$i")): _*)
      .withColumn("cell", explode(col("pcells"))).drop("pcells")
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("n_id"))
    codes.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(i => element_at(col(s"lut$i"), col(s"c$i")))
          .reduce(_ + _).as("adist"))
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
    val cent = kmeansCentroids(fv.select("vec_id", "v"), k, rounds)
    // map-side assignment keeps (v, nrm) — no join back on vec_id
    val e = assignKeep(fv, cent).drop("dist2")
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
    // one scan carries embedding + norm + quantized v; the frozen-corpus
    // training reads the < split slice of it, and the batch+corpus
    // assignment attaches map-side (no join back on vec_id)
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"), normE12(col("embedding")).as("nrm"),
        v6Arr(col("embedding")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cent = kmeansCentroids(
      base.filter(col("vec_id") < split).select("vec_id", "v"), k, rounds)
    val e = assignKeep(base, cent).drop("v", "dist2")
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
    assignKeep(emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"), normE12(col("embedding")).as("nrm"),
        v6Arr(col("embedding")).as("v")), cent)
      .drop("v", "dist2")

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
