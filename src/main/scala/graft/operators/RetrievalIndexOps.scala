package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The LANDED text-retrieval index — the production read path for
  * hybrid (dense ∪ sparse) document retrieval.
  *
  * [[RetrievalOps.hybridRetrieval]] recomputes BOTH corpus-side
  * structures inside every query execution: the hashed doc vectors
  * (a full XXH64 pass over every token) and the df-capped posting
  * lists (a token-level distinct + df aggregation). Correct — the
  * oracle demands it — but at 100 TB those are the two most expensive
  * passes in the key, and they change only when the corpus changes.
  * Production separates build from read (the [[AnnIndexOps]] shape,
  * applied to text): a BUILD job lands three artifacts and every
  * search afterwards only READS them:
  *
  *   `vectors/`   the hashed doc vectors (doc_id, v, nrm) — the dense
  *                leg's corpus side ([[TextOps.docNeighborVectors]])
  *   `postings/`  the df-capped (doc_id, tok) posting list — the
  *                sparse leg's corpus side; the kept-token set is
  *                decided ONCE at build time against the whole corpus
  *   `doclens/`   per-doc kept-token counts (doc_id, n_tok)
  *
  * The probe reads ONLY the artifacts — query docs are corpus members,
  * so even the query-side vectors/tokens come from the landed frames —
  * and runs the exact same leg + fusion cores as the inline key, so
  * the landed path is bit-identical to [[RetrievalOps.hybridRetrieval]]
  * (the keyed `retrieval_index_probe` shares hybrid_retrieval's oracle
  * verbatim, and the spec asserts frame equality directly).
  *
  * Scale shape: build cost is the two one-off corpus passes; probe
  * cost is the broadcast-query candidate join on each leg plus the
  * bounded RRF align — no hashing, no df aggregation, no token
  * distinct at read time. Re-landing on corpus change is the same
  * rebuild-vs-admit tradeoff as the ANN index.
  */
object RetrievalIndexOps {

  /** Land the retrieval artifacts for `docs` under `baseDir` — the
    * one-off build job. */
  def buildRetrievalIndex(s: SparkSession, docs: DataFrame, baseDir: String): Unit = {
    val sh = RetrievalOps.lexicalPostings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("overwrite").parquet(s"$baseDir/postings")
    RetrievalOps.lexicalDocLens(sh)
      .write.mode("overwrite").parquet(s"$baseDir/doclens")
    sh.unpersist()
    TextOps.docNeighborVectorsOf(docs)
      .write.mode("overwrite").parquet(s"$baseDir/vectors")
  }

  /** Hybrid RRF top-k against the LANDED index — zero corpus passes
    * beyond the artifact reads; every arithmetic step mirrors the
    * inline composition exactly. */
  def probeRetrievalIndex(s: SparkSession, indexDir: String,
      k: Int = RetrievalOps.PoolK): DataFrame = {
    val vectors = s.read.parquet(s"$indexDir/vectors")
    val sh = s.read.parquet(s"$indexDir/postings")
    val sz = s.read.parquet(s"$indexDir/doclens")
    RetrievalOps.fuseRrf(
      TextOps.docNeighborsFromVectors(vectors, RetrievalOps.PoolK),
      RetrievalOps.lexicalFromPostings(sh, sz, RetrievalOps.PoolK), k)
  }

  /** The two ranked legs over the landed artifacts, separately — the
    * ScaleProbe hook (per-leg walls show the sparse leg tracking its
    * cap-bounded candidate volume while the dense leg pays the brute
    * |Q|·n baseline). (dense, sparse). */
  def probeLegs(s: SparkSession, indexDir: String,
      k: Int = RetrievalOps.PoolK): (DataFrame, DataFrame) =
    (TextOps.docNeighborsFromVectors(s.read.parquet(s"$indexDir/vectors"), k),
      RetrievalOps.lexicalFromPostings(s.read.parquet(s"$indexDir/postings"),
        s.read.parquet(s"$indexDir/doclens"), k))

  /** Per-JVM memo of built indexes (the [[AnnIndexOps.annIndexProbe]]
    * convention): the build job runs ONCE per corpus dir; every keyed
    * call afterwards is probe-only — Bench's warmup pass pays the
    * build, the timed reps measure the read path. */
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureIndex(s: SparkSession, dir: String, variant: String)(
      corpus: DataFrame => DataFrame): String =
    builtIndexes.computeIfAbsent(s"$variant:$dir", _ => {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_retridx_$variant").toString
      buildRetrievalIndex(s, corpus(Tables.documents(s, dir)), base)
      s.catalog.clearCache()
      base
    })

  /** retrieval_index_probe — hybrid RRF retrieval over the landed
    * artifacts. Bit-identical to hybrid_retrieval (shared oracle). */
  def retrievalIndexProbe(s: SparkSession, dir: String): DataFrame =
    probeRetrievalIndex(s, ensureIndex(s, dir, "full")(identity))

  /** Idempotent index admission: append a batch of NEW documents
    * against the FROZEN artifacts — postings filtered to the frozen
    * kept-token vocabulary (build-time df decides membership; a fixed
    * vocabulary is the point of freezing, exactly like the frozen PQ
    * codebooks), doc lengths counted over kept tokens, vectors hashed
    * statelessly (the hash has no corpus state to freeze). Each
    * artifact anti-joins on its own doc_id set, so an at-least-once
    * replay — full or after partial failure — appends nothing. Returns
    * the number of newly admitted documents. */
  def admitToRetrievalIndex(s: SparkSession, indexDir: String,
      batch: DataFrame): Long = {
    import org.apache.spark.storage.StorageLevel
    val frozenVocab = s.read.parquet(s"$indexDir/postings")
      .select("tok").distinct()
    val batchTok = batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
      .join(frozenVocab, "tok")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freshIds = (existing: DataFrame, frame: DataFrame) =>
      frame.join(existing.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val freshPost = freshIds(s.read.parquet(s"$indexDir/postings"), batchTok)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = freshPost.select("doc_id").distinct().count()
    if (n > 0) {
      freshPost.select("doc_id", "tok")
        .write.mode("append").parquet(s"$indexDir/postings")
      RetrievalOps.lexicalDocLens(freshPost)
        .write.mode("append").parquet(s"$indexDir/doclens")
    }
    val freshVecs = freshIds(s.read.parquet(s"$indexDir/vectors"),
      TextOps.docNeighborVectorsOf(batch))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nv = freshVecs.count()
    if (nv > 0)
      freshVecs.write.mode("append").parquet(s"$indexDir/vectors")
    batchTok.unpersist(); freshPost.unpersist(); freshVecs.unpersist()
    math.max(n, nv)
  }

  /** retrieval_index_probe_admitted — the grow-then-search loop for
    * text: artifacts frozen on the corpus slice (doc_id <
    * [[DedupOps.IncrementalSplit]], the shared admission convention),
    * the post-build batch admitted through [[admitToRetrievalIndex]]
    * (an idempotent no-op after the first call), then the probe
    * searches corpus + admitted docs together — what document ingest
    * lands is immediately retrievable with NO rebuild. The frozen
    * vocabulary shows: batch-only tokens are absent from the sparse
    * leg (by design — a fixed vocab is what freezing means), while the
    * dense leg sees every doc (hashing is stateless). The oracle is
    * the hybrid twin with the kept-token df computed over the corpus
    * slice only. */
  def retrievalIndexProbeAdmitted(s: SparkSession, dir: String): DataFrame = {
    val split = DedupOps.IncrementalSplit
    val idx = ensureIndex(s, dir, "grown")(_.filter(col("doc_id") < split))
    admitToRetrievalIndex(s, idx,
      Tables.documents(s, dir).filter(col("doc_id") >= split))
    probeRetrievalIndex(s, idx)
  }

  /** Fold admission's appended small files back into full-size ones,
    * per artifact directory ([[graft.Jobs.compactLeaf]]'s crash-safe
    * rename-pair) — the text-index maintenance twin of
    * [[AnnIndexOps.compactAnnIndex]]. Artifacts that never fragmented
    * (≤1 parquet file) are skipped, so a quiet-day run is a no-op.
    * Returns the number of artifact directories rewritten. */
  def compactRetrievalIndex(s: SparkSession, indexDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int =
    Seq("postings", "doclens", "vectors").count { a =>
      import java.nio.file.{Files, Path, Paths}
      val d = Paths.get(s"$indexDir/$a")
      val fs = Files.list(d)
      val n = try fs.toArray.map(_.asInstanceOf[Path]).toSeq
          .count(_.getFileName.toString.endsWith(".parquet"))
        finally fs.close()
      if (n > 1) { graft.Jobs.compactLeaf(s, d.toString, targetFileBytes); true }
      else false
    }

  /** retrieval_index_probe_compacted — the text-index LIFECYCLE in one
    * key: build on the corpus slice, admit the growth batch, COMPACT
    * the fragmented artifacts, probe. Pure layout — bit-identical to
    * `retrieval_index_probe_admitted` (shared oracle verbatim). */
  def retrievalIndexProbeCompacted(s: SparkSession, dir: String): DataFrame = {
    val split = DedupOps.IncrementalSplit
    val idx = ensureIndex(s, dir, "grown_compact")(_.filter(col("doc_id") < split))
    admitToRetrievalIndex(s, idx,
      Tables.documents(s, dir).filter(col("doc_id") >= split))
    compactRetrievalIndex(s, idx)
    probeRetrievalIndex(s, idx)
  }
}
