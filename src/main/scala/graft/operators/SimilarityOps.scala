package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.{dotE12, normE12}

/** Similarity search over the embeddings table, SURVEY.md §2 #29–30.
  *
  * #29 is the brute-force cosine top-k correctness baseline (exact, with a
  * DuckDB oracle). #30 is the scale path: random-hyperplane LSH buckets →
  * per-bucket exact top-k → per-query merge. At 1000 executors the bucket
  * join replaces the all-pairs cross join; bucket width (number of planes)
  * trades recall for pair volume.
  */
object SimilarityOps {

  /** Query-subset convention: vectors whose id is a multiple of this are
    * the query set. Single source of truth for annCosineTopK / annLsh /
    * annIvf / knnClassify AND the DuckDB oracle (OracleSql interpolates
    * it) — an inner join on q_id means a silent divergence would drop or
    * mislabel queries rather than fail. */
  val QueryModulus = 100
  def isQuery(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    id % QueryModulus === 0

  /** Embeddings with the exact scaled-int squared norm attached. */
  private def withNorm(s: SparkSession, dir: String): DataFrame =
    normed(Tables.embeddings(s, dir))

  private def normed(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"), normE12(col("embedding")).as("nrm"))

  /** #29 ann_cosine_topk — brute-force exact cosine top-k for the query
    * subset (vec_id % 100 == 0). The query side is tiny → broadcast; the
    * corpus streams once; TakeOrdered per query via window row_number. */
  def annCosineTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    annCosineTopKFrom(Tables.embeddings(s, dir), k)

  /** Brute-force core on any (vec_id, embedding) frame (ScaleProbe's
    * recall baseline at grown corpus sizes). */
  def annCosineTopKFrom(emb: DataFrame, k: Int = 5): DataFrame = {
    val e = normed(emb)
    val q = e.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        DedupOps.cosine(dotE12(col("q_emb"), col("embedding")),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "cos_sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  // 6 planes → 64 buckets. At the test corpus sizes (500–5000 vectors)
  // this keeps ~8–80 vectors per bucket so queries actually have
  // neighbors; at cluster scale you'd raise planes with corpus size
  // (buckets ≈ n / desired_bucket_size) and multi-probe for recall.
  val NumPlanes = 6

  /** Deterministic ±1 hyperplane weights (seeded), as literal float arrays
    * baked into the plan — broadcast to every executor for free. */
  // package-visible: OracleSql inlines the SAME planes as DuckDB list
  // literals so the LSH bucket oracles are bit-exact
  private[graft] def planeWeights(dim: Int): IndexedSeq[Array[Float]] = {
    (0 until NumPlanes).map { p =>
      val rng = new scala.util.Random(42L * (p + 1))
      Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
    }
  }

  /** Hyperplane-LSH bucket id of an embedding column: bit p = sign of the
    * dot product with plane p (native codegen DotE12 against a literal
    * array — no per-row weight materialization). */
  def lshBucket(emb: org.apache.spark.sql.Column, dim: Int = 64): org.apache.spark.sql.Column = {
    val planes = planeWeights(dim)
    (0 until NumPlanes).map { p =>
      val w = array(planes(p).toIndexedSeq.map(v => lit(v)): _*)
      when(dotE12(emb, w) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ann_ivf — IVF: a k-means coarse quantizer splits the corpus into
    * cells; each query probes its `nprobe` nearest cells and runs exact
    * cosine only there. The cell id is the equi-join key, so compute is
    * |Q| × (nprobe/cells) × |corpus|. Centroids travel as a TINY
    * broadcast-joined frame (`cells` rows), so plan and codegen size are
    * independent of the cell count — at the √n cells a real corpus needs
    * (10³–10⁴), literal centroid arrays would blow up the plan (round-2
    * verdict).
    *
    * The quantizer is [[ClusterOps.kmeansCentroids]] — the exact
    * integer-arithmetic Lloyd's every other kmeans consumer here uses
    * (deterministic init = vec_id < cells, argmin with total-order
    * tie-break) — so the whole query is oracle-checked through the
    * unrolled-kmeans twin (it replaced the seeded Spark-ML kmeans||
    * fit, which had no cross-engine fixed point and kept this key
    * rows-only through round 8). */
  def annIvf(s: SparkSession, dir: String, k: Int = 5, cells: Int = 16,
      nprobe: Int = 2, rounds: Int = 2): DataFrame =
    annIvfFrom(Tables.embeddings(s, dir), k, cells, nprobe, rounds)

  /** IVF core on any (vec_id, embedding) frame — lets ScaleProbe grow the
    * corpus and follow cells ≈ √corpus, the sizing rule the scaladoc
    * claims; recall + probe cost at 1×/4×/16× are recorded in SURVEY §5.
    * rounds=2: a coarse quantizer only needs approximate cells; raise it
    * when cells must be tight (many cells, low nprobe). */
  def annIvfFrom(emb: DataFrame, k: Int = 5, cells: Int = 16,
      nprobe: Int = 2, rounds: Int = 2): DataFrame = {
    // Persisted: the training rounds, the cell assignment, and the
    // corpus/probe sides all read this ONE scan (embedding + norm +
    // quantized v — the combined projection replaces the old
    // assignment⋈normed join back on vec_id). Cache contract: consumed
    // by the returned lazy plan — callers clear it once the result is
    // consumed (spark.catalog.clearCache(), as Verify/Bench do per
    // query).
    val e = normed(emb)
      .withColumn("v", ClusterOps.v6Arr(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = ClusterOps.kmeansCentroids(e.select("vec_id", "v"),
      cells, rounds).localCheckpoint()
    // map-side cell assignment (ClusterOps.assignKeep rationale)
    val corpus = ClusterOps.assignKeep(e, cent)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cluster").as("cell"))
    // probe choice: exact integer L2 to each centroid, top-nprobe with
    // the (distance, cell) total-order tie-break the oracle mirrors —
    // map-side (probeCellsKeep), carrying the query payload through so
    // the old probes⋈queries join on q_id is gone too
    val qe = ClusterOps.probeCellsKeep(e.filter(isQuery(col("vec_id"))),
        cent, nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    val scored = corpus.join(broadcast(qe), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        DedupOps.cosine(dotE12(col("q_emb"), col("embedding")),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "cos_sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** Multi-probe masks for a hyperplane bucket code: every bucket within
    * hamming `probeBits` of the base code (identity, then 1-bit flips,
    * then 2-bit flips, …). The radius is the recall lever that must grow
    * WITH the plane count at scale (hamming-R of p planes covers a
    * shrinking bucket fraction as p grows — measured in ScaleProbe's
    * maxsim_recall lines). Shared by [[annLsh]] and
    * [[graft.operators.DedupOps.embeddingLshPairs]]. */
  def probeMasks(probeBits: Int, planes: Int = NumPlanes): Seq[Long] = {
    require(probeBits >= 0 && probeBits <= planes,
      "probeBits must be in [0, planes]")
    def choose(start: Int, r: Int): Seq[Long] =
      if (r == 0) Seq(0L)
      else (start until planes).flatMap(i =>
        choose(i + 1, r - 1).map(m => m | (1L << i)))
    (0 to probeBits).flatMap(r => choose(0, r))
  }

  /** #30 ann_lsh (rows-only) — bucketed ANN: queries probe only their own
    * hyperplane bucket; exact cosine + top-k within the bucket. The
    * bucket equi-join is the shuffle key, so pair volume is
    * sum(bucket_size × queries_in_bucket), never |Q|×|corpus|. */
  def annLsh(s: SparkSession, dir: String, k: Int = 5, probeBits: Int = 2): DataFrame = {
    val e = withNorm(s, dir).withColumn("bucket", lshBucket(col("embedding")))
    // multi-probe: each query also probes the buckets within hamming
    // `probeBits` (sign bits flipped) — the standard recall lever, costing
    // probes× the (tiny) query side, not the corpus side
    val probes = array(probeMasks(probeBits).map(lit): _*)
    val q = e.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        DedupOps.cosine(dotE12(col("q_emb"), col("embedding")),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "cos_sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** knn_classify — k-nearest-neighbor label prediction for the query
    * subset: majority vote over the [[annCosineTopK]] neighbor labels
    * (ties break to the smallest label), scored against the query's own
    * label. Composes ON the existing top-k — the extra work is a
    * broadcast label join, a vote groupBy bounded by queries × labels,
    * and a top-1 window over ≤ |labels| rows per query. At 100×, swap
    * the brute-force neighbor source for [[annLsh]]/[[annIvf]] — the
    * vote/score stages are unchanged (the recall-transfer spec shows the
    * candidate sets agree in the operating regime). */
  def knnClassify(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val votes = annCosineTopK(s, dir, k)
      .join(broadcast(labels.withColumnRenamed("vec_id", "n_id")), "n_id")
      .groupBy("q_id", "label")
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    votes.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
      .join(broadcast(labels.filter(isQuery(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("label").as("true_label"))), "q_id")
      .select(col("q_id"), col("pred_label"), col("votes"), col("true_label"),
        (col("pred_label") === col("true_label")).as("correct"))
      .orderBy("q_id")
  }

  /** hard_negatives — contrastive-pair mining: for every query vector,
    * the top-k nearest neighbors whose label DIFFERS from the query's —
    * the "close in embedding space, semantically different" examples a
    * contrastive/embedding-training pipeline batches as hard negatives
    * (the in-batch-negatives step of DPR/SimCSE-style training, run
    * corpus-side so the loader just reads pairs). Same exact scaled-int
    * cosine + brute candidate source as [[annCosineTopK]] (the label
    * filter rides the join condition, so mismatched-label pairs never
    * reach the scorer); at 100× swap the candidate source for
    * [[annLsh]]/[[annIvf]] buckets — the label filter and top-k window
    * are unchanged. */
  def hardNegatives(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    hardNegativesFrom(Tables.embeddings(s, dir), k)

  /** Core on any (vec_id, embedding, label) frame (testable with
    * planted cross-label twins). */
  def hardNegativesFrom(emb: DataFrame, k: Int = 5): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("embedding"), col("label"),
        normE12(col("embedding")).as("nrm"))
    val q = e.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))
    val scored = e.join(broadcast(q),
        col("q_id") =!= col("vec_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("n_id"),
        col("label").as("n_label"),
        DedupOps.cosine(dotE12(col("q_emb"), col("embedding")),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "q_label", "n_id", "n_label", "cos_sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** hard_negatives_lsh — the BUCKETED twin of [[hardNegatives]] (the
    * ann_cosine_topk → ann_lsh pattern with the label filter riding the
    * same join): multi-probe hyperplane buckets generate the candidates,
    * the cross-label filter and exact cosine run on collisions only, the
    * top-k window is unchanged. The contrastive-mining leg at 100×: pair
    * volume is Σ(bucket × queries-in-bucket), never |Q| · corpus. Fully
    * oracle-checked (seeded planes inlined as literals — the ann_lsh
    * twin plus the label predicate). */
  def hardNegativesLsh(s: SparkSession, dir: String, k: Int = 5,
      probeBits: Int = 2): DataFrame =
    hardNegativesLshFrom(Tables.embeddings(s, dir), k, probeBits)

  /** Core on any (vec_id, embedding, label) frame (planted-twin specs). */
  def hardNegativesLshFrom(emb: DataFrame, k: Int = 5,
      probeBits: Int = 2): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("embedding"), col("label"),
        normE12(col("embedding")).as("nrm"))
      .withColumn("bucket", lshBucket(col("embedding")))
    val probes = array(probeMasks(probeBits).map(lit): _*)
    val q = e.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("n_id"),
        col("label").as("n_label"),
        DedupOps.cosine(dotE12(col("q_emb"), col("embedding")),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "q_label", "n_id", "n_label", "cos_sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** embedding_centroids — per-label centroid of the embedding column,
    * element-wise: posexplode to (label, dim, component), scale each
    * component to an exact e6 integer at the ROW level, sum the integers
    * (one partial-agg shuffle on (label, dim) — map-side combine makes
    * shuffle bytes labels × dims × executors, never the corpus), divide
    * back to a double once at the edge. The cluster-summary pass of an
    * embedding pipeline (and the exact twin of what annIvf's kmeans fit
    * iterates); deterministic → fully oracle-checkable. */
  /** embedding_norm_stats — per-label L2-norm panel (n, avg/min/max
    * norm, dim bounds): the embedding-table health check run before any
    * ANN build (zero or wildly-scaled vectors poison IVF/LSH training).
    *
    * Norms are computed per ROW with one array fold (no explode — the
    * row count, not row×dim, reaches the shuffle) over e6-scaled integer
    * components; Σv6² accumulates in decimal(38,0) (the corrAgg moment
    * pattern — a long wraps silently once one component's e6 square
    * passes 2⁶³, i.e. |v| ≳ 3037, exactly the wildly-scaled vectors this
    * panel exists to catch; the oracle mirrors with HUGEINT) and IEEE
    * sqrt is correctly rounded in both engines, so quantizing the norm
    * back to an e6 integer is bitwise deterministic. One label-keyed
    * partial-agg shuffle of bounded-decimal moments — the 100 TB shape. */
  def embeddingNormStats(s: SparkSession, dir: String): DataFrame = {
    def v6(x: Column) = floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long")
    val ss = aggregate(col("embedding"), lit(0L).cast("decimal(38,0)"),
      (acc, x) => (acc + (v6(x).cast("decimal(19,0)") * v6(x).cast("decimal(19,0)"))
        .cast("decimal(38,0)")).cast("decimal(38,0)"))
    val n6 = floor(sqrt(ss.cast("double")) + lit(0.5)).cast("long")
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"), n6.as("n6"),
        size(col("embedding")).cast("long").as("dim"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
        (sum(col("n6")).cast("double") / lit(1000000.0) / count(lit(1))).as("avg_norm"),
        (min(col("n6")).cast("double") / lit(1000000.0)).as("min_norm"),
        (max(col("n6")).cast("double") / lit(1000000.0)).as("max_norm"))
      .orderBy("label")
  }

  def embeddingCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        floor(col("v").cast("double") * lit(1000000.0) + lit(0.5)).cast("long").as("v6"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum(col("v6")).as("sum_e6"))
      .select(col("label"), col("dim"), col("n"),
        (col("sum_e6").cast("double") / col("n") / lit(1000000.0)).as("centroid"))
      .orderBy("label", "dim")

  /** Deterministic ±1 projection planes for [[embeddingProject]] — a
    * DIFFERENT seed family from the LSH planes so the two operators stay
    * independent. Shared with the DuckDB oracle (OracleSql interpolates
    * the same values as list literals). */
  def projPlanes(k: Int, dim: Int = 64): IndexedSeq[Array[Float]] =
    (0 until k).map { p =>
      val rng = new scala.util.Random(1234L * (p + 7))
      Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
    }

  /** embedding_project — Johnson–Lindenstrauss random projection: each
    * output coordinate is the EXACT scaled-int dot product (native
    * codegen [[DotE12]]) of the embedding with a seeded ±1 plane,
    * reducing 64-dim float vectors to `k` exact BIGINTs. The cheap
    * preprocessing for clustering/dedup at 10⁹⁺ vectors: pairwise
    * distances survive within (1±ε) with high probability, downstream
    * operators compare k integers instead of 64 floats, and the
    * all-integer output hash-matches the DuckDB oracle bit-for-bit.
    * One projection inside whole-stage codegen; zero shuffles before
    * the presentation sort. */
  def embeddingProject(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val cols = projPlanes(k).zipWithIndex.map { case (p, i) =>
      dotE12(col("embedding"), array(p.toIndexedSeq.map(lit): _*)).as(s"p$i")
    }
    Tables.embeddings(s, dir)
      .select(col("vec_id") +: cols: _*)
      .orderBy("vec_id")
  }
}
