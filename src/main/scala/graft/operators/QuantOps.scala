package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.normE12

/** Scalar quantization (SQ8) of the embeddings table — the int8
  * compression leg of a large-scale vector pipeline (SURVEY.md §2 #30x).
  *
  * PQ (ClusterOps) compresses 64 floats to M codebook ids by TRAINING
  * k-means codebooks; SQ8 is the training-free sibling every production
  * vector store ships first: per-dimension min/max over the corpus →
  * each float maps to an 8-bit level → 4× less storage/IO, decode is two
  * flops. The corpus statistics are ONE single-row aggregate of two
  * 64-value arrays (broadcast back — never a driver collect), and
  * quantize/decode/score are array-lambda projections over that
  * broadcast (the chunkNeighbors zip_with idiom: per-dim UNROLLED
  * expressions planned 5× slower here for zero runtime win — the
  * round-11 lesson), so the whole operator is a two-scan,
  * zero-extra-shuffle pass at any corpus size.
  *
  * Determinism contract (how these keys stay DuckDB-hash-exact): floats
  * widen to double (exact), min/max involve no accumulation, and every
  * double chain — `(x-mn)/(mx-mn)*255.0+0.5`, the reconstruction, the
  * e12-scaled error terms — is written with IDENTICAL association in the
  * SQL twin, then floored to integers BEFORE any reduction, so sums are
  * exact longs and accumulation order cannot perturb anything.
  */
object QuantOps {

  /** Embedding dimensionality (the embeddings-table contract shared with
    * SimilarityOps/ClusterOps) and quantization levels (8-bit → 0..255).
    * OracleSql interpolates both so the twins can't drift. */
  val SqDims = 64
  val SqLevels = 255

  /** The per-dimension (min, max) corpus statistics as ONE single-row
    * two-array aggregate, cross-broadcast onto `e` — the quantizer
    * "model" is 128 doubles, the size of a filter literal. */
  private def withStats(e: DataFrame): DataFrame = {
    def x(i: Int) = element_at(col("embedding"), i + 1).cast("double")
    val stats = e.agg(
      array((0 until SqDims).map(i => min(x(i))): _*).as("mna"),
      array((0 until SqDims).map(i => max(x(i))): _*).as("mxa"))
    e.crossJoin(broadcast(stats))
  }

  // lambda index is 0-based → 0-based getItem (not 1-based element_at)
  private def mn(i: Column): Column = col("mna").getItem(i)
  private def mx(i: Column): Column = col("mxa").getItem(i)

  /** 8-bit level array: q[i] = floor((x-mn)/(mx-mn)*255+0.5), 0 on a
    * degenerate (constant) dimension. Spark's floor(double) is BIGINT. */
  private def qArr: Column =
    transform(col("embedding"), (v, i) =>
      when(mx(i) > mn(i),
        floor((v.cast("double") - mn(i)) / (mx(i) - mn(i))
          * lit(SqLevels.toDouble) + lit(0.5)))
        .otherwise(lit(0L)))

  /** Decoded vector from the 8-bit levels (two flops per dim — codes
    * never round-trip through floats). */
  private def rArr(q: Column): Column =
    transform(q, (qv, i) =>
      when(mx(i) > mn(i),
        mn(i) + qv.cast("double") / lit(SqLevels.toDouble) * (mx(i) - mn(i)))
        .otherwise(mn(i)))

  private def lsum(a: Column): Column =
    aggregate(a, lit(0L), (acc, v) => acc + v)

  /** #30x embedding_sq8 — quantize every corpus vector to 8-bit levels
    * and report, per vector, exact integer checksums of the code vector
    * (sum, sum of squares) plus the e12-scaled squared reconstruction
    * error — the drift panel a store would watch to decide when SQ8's
    * resolution stops being enough and PQ/IVF retraining is due. The
    * checksums pin every one of the 64 codes bit-exactly without
    * emitting a 64-wide frame. */
  def embeddingSq8(s: SparkSession, dir: String): DataFrame =
    embeddingSq8From(Tables.embeddings(s, dir))

  /** Core on any (vec_id, embedding) frame (ScaleProbe drives grown
    * corpora through the same code path). */
  def embeddingSq8From(e: DataFrame): DataFrame =
    withStats(e)
      .select(col("vec_id"), qArr.as("q"), col("mna"), col("mxa"), col("embedding"))
      .select(col("vec_id"),
        lsum(col("q")).as("code_sum"),
        lsum(transform(col("q"), v => v * v)).as("code_sqsum"),
        lsum(zip_with(col("embedding"), rArr(col("q")), (a, b) =>
          floor((a.cast("double") - b) * (a.cast("double") - b) * lit(1e12)
            + lit(0.5)))).as("err_e12"))
      .orderBy("vec_id")

  /** #30y ann_sq_topk — asymmetric-distance probe over the SQ8 corpus:
    * full-precision queries (vec_id % QueryModulus == 0) score against
    * DECODED corpus vectors by exact-integer cosine, top-k per query.
    * The corpus decodes ONCE (r + its e12 norm materialize before the
    * join — decode cost is O(corpus), never O(corpus × queries)), then
    * the same broadcast-queries × one-corpus-scan shape as
    * ann_cosine_topk — but the corpus side reads 8-bit codes (4× less
    * IO at 100 TB), and the recall/compression trade is measurable
    * against the exact key because both rank with the identical e12
    * kernel. */
  def annSqTopk(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    annSqTopkFrom(Tables.embeddings(s, dir), k)

  /** Core on any (vec_id, embedding) frame (ScaleProbe's grown-corpus
    * recall/wall probe). */
  /** Decoded SQ8 corpus — (vec_id, r, rn2): reconstruction vector plus
    * its exact-integer e12 norm. Decode happens ONCE per corpus vector
    * (O(corpus), never O(corpus × queries)); shared by [[annSqTopkFrom]]
    * and the IVF-SQ composition [[annIvfSqFrom]]. */
  private[operators] def decodedCorpus(e: DataFrame): DataFrame =
    withStats(e)
      .select(col("vec_id"), rArr(qArr).as("r"))
      .select(col("vec_id"), col("r"),
        lsum(transform(col("r"), v =>
          floor(v * v * lit(1e12) + lit(0.5)))).as("rn2"))

  def annSqTopkFrom(e: DataFrame, k: Int = 5): DataFrame = {
    val decoded = decodedCorpus(e)
    val q = e.filter(SimilarityOps.isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        normE12(col("embedding")).as("qn"))
    val dot = lsum(zip_with(col("q_emb"), col("r"), (a, b) =>
      floor(a.cast("double") * b * lit(1e12) + lit(0.5))))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    decoded
      .join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("rn2").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_id", "rnk")
  }

  /** #30z ann_ivf_sq — the production composition that completes the
    * quantization matrix (flat SQ8 = ann_sq_topk, trained PQ = ann_pq,
    * IVF+PQ = ann_ivf_pq): an IVF coarse quantizer restricts each query
    * to its nprobe nearest cells, and INSIDE the probed cells the corpus
    * side is the SQ8-decoded reconstruction, not the raw floats — the
    * cell join prunes candidates (cells ≈ √corpus at scale, the ann_ivf
    * sizing rule) while SQ8 cuts the per-candidate read to 8-bit codes
    * (4× less IO than float32). Training cost is the coarse quantizer
    * only — no PQ codebooks — which is why IVF-SQ is what stores ship
    * when recall at 8-bit resolution suffices (ann_sq_topk's ScaleProbe
    * measured 0.98–1.00 vs exact at 64 dims).
    *
    * Determinism: the cell path is ann_ivf's exact-integer kmeans +
    * (distance, cell) probe tie-break; the scoring kernel is
    * ann_sq_topk's per-term-floored e12 cosine — both already
    * oracle-twinned, so this key's twin is their literal composition. */
  def annIvfSq(s: SparkSession, dir: String, k: Int = 5, cells: Int = 16,
      nprobe: Int = 2, rounds: Int = 2): DataFrame =
    annIvfSqFrom(Tables.embeddings(s, dir), k, cells, nprobe, rounds)

  /** Core on any (vec_id, embedding) frame (ScaleProbe entry point).
    * Cache contract: persists the quantized training frame until the
    * result is consumed (callers clearCache() per query, as Verify/Bench
    * do). */
  def annIvfSqFrom(emb: DataFrame, k: Int = 5, cells: Int = 16,
      nprobe: Int = 2, rounds: Int = 2): DataFrame = {
    val q = ClusterOps.quantized(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = ClusterOps.kmeansCentroids(q, cells, rounds).localCheckpoint()
    // corpus side: decode + quantized v in ONE scan, cell attached
    // map-side (the old shape joined a separately-shuffled assignment
    // back on vec_id — ClusterOps.assignKeep rationale)
    val corpus0 = withStats(emb)
      .select(col("vec_id"), rArr(qArr).as("r"),
        ClusterOps.v6Arr(col("embedding")).as("v"))
      .select(col("vec_id"), col("r"), col("v"),
        lsum(transform(col("r"), v =>
          floor(v * v * lit(1e12) + lit(0.5)))).as("rn2"))
    val corpus = ClusterOps.assignKeep(corpus0, cent)
      .select(col("vec_id"), col("r"), col("rn2"), col("cluster").as("cell"))
    // probe choice map-side (probeCellsKeep = the window's (cd, cell)
    // total order), query payload carried through — no q_id join
    val qe = ClusterOps.probeCellsKeep(
        emb.filter(SimilarityOps.isQuery(col("vec_id")))
          .select(col("vec_id"), col("embedding"),
            normE12(col("embedding")).as("qn"),
            ClusterOps.v6Arr(col("embedding")).as("v")),
        cent, nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("qn"), col("cell"))
    val dot = lsum(zip_with(col("q_emb"), col("r"), (a, b) =>
      floor(a.cast("double") * b * lit(1e12) + lit(0.5))))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    corpus.join(broadcast(qe), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("rn2").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_id", "rnk")
  }
}
