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
  *                corpus bridge frame ([[TextOps.docNeighborVectors]]),
  *                kept flat for non-search consumers
  *   `buckets/`   the SAME rows PARTITIONED BY their hyperplane-LSH
  *                bucket ([[TextOps.docLshBucket]]) — the dense leg's
  *                search-side layout (the [[AnnIndexOps]] `codes/`
  *                cell-partitioning pattern): a probe that touches
  *                `probed` of 2^planes buckets reads only that
  *                fraction of the corpus files
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
  * cost is the bucket-equi-join candidate volume on the dense leg
  * (collision-bounded, never |Q|·n) and the cap-bounded posting join
  * on the sparse leg, plus the bounded RRF align — no hashing, no df
  * aggregation, no token distinct at read time. Re-landing on corpus
  * change is the same rebuild-vs-admit tradeoff as the ANN index.
  */
object RetrievalIndexOps {

  /** Land the retrieval artifacts for `docs` under `baseDir` — the
    * one-off build job. The dense leg's LSH plane count is SIZED FROM
    * THE CORPUS at build time ([[TextOps.adaptivePlanes]]: smallest p
    * with target·2^p ≥ vectors, floored at the keyed
    * [[TextOps.DocPlanes]]) and landed as `meta/` alongside the data
    * artifacts — the probe, admission, and the health panel all read the
    * landed count, never re-derive it (a probe masking 6 planes against
    * a 10-plane index would search the wrong buckets by construction).
    * At the test corpora the rule yields exactly [[TextOps.DocPlanes]],
    * so the landed probe stays bit-identical to the inline fused keys;
    * at 10⁹ docs it yields ~23 planes, keeping per-bucket occupancy —
    * and with it the probe's candidate-join volume — flat instead of
    * growing linearly with the corpus (measured in ScaleProbe's
    * dense_lsh_candidates probe: 25.2M→6.7M candidate pairs at 16×
    * growth). */
  def buildRetrievalIndex(s: SparkSession, docs: DataFrame, baseDir: String): Unit = {
    val sh = RetrievalOps.lexicalPostings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // column order pinned to the admission append's (doc_id, tok) so
    // every file in the artifact shares one physical schema
    sh.select("doc_id", "tok").write.mode("overwrite")
      .parquet(s"$baseDir/postings")
    RetrievalOps.lexicalDocLens(sh)
      .write.mode("overwrite").parquet(s"$baseDir/doclens")
    sh.unpersist()
    val vecs = TextOps.docNeighborVectorsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.write.mode("overwrite").parquet(s"$baseDir/vectors")
    val builtDocs = vecs.count()
    val planes = TextOps.adaptivePlanes(builtDocs)
    vecs.withColumn("bucket", TextOps.docLshBucketN(col("v"), planes))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$baseDir/buckets")
    vecs.unpersist()
    // CHUNK-grain vectors under the SAME plane family (round 11): the
    // late-interaction (MaxSim) probe's corpus side — one more one-off
    // corpus pass at build time buys passage-level retrieval with zero
    // read-time hashing. One plane count governs the whole index (docs
    // and chunks share the hashed space; per-bucket chunk occupancy is
    // chunks-per-doc × doc occupancy, the same flat-at-scale story).
    // Column order pinned to the admission append's.
    TextOps.chunkVectorsOf(docs)
      .withColumn("bucket", TextOps.docLshBucketN(col("v"), planes))
      .select("doc_id", "chunk_id", "v", "nrm", "bucket")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$baseDir/chunks")
    // load-bearing metadata, landed LAST: planes decides which buckets a
    // probe masks and which bucket admission appends into
    s.range(1).select(lit(planes.toLong).as("planes"),
        lit(builtDocs).as("built_docs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$baseDir/meta")
  }

  /** The landed (planes, built_docs) metadata. Indexes landed before the
    * meta artifact existed were built at the then-fixed
    * [[TextOps.DocPlanes]] — that fallback is correct by construction,
    * not a guess. */
  private[graft] def readMeta(s: SparkSession, indexDir: String): (Int, Long) =
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$indexDir/meta")))
      (TextOps.DocPlanes, -1L)
    else {
      val r = s.read.parquet(s"$indexDir/meta").head()
      (r.getAs[Long]("planes").toInt, r.getAs[Long]("built_docs"))
    }

  /** The bucket-partitioned dense corpus side, with the partition column
    * normalized back to its build-time long type (partition values
    * round-trip as ints — the [[AnnIndexOps.readCodes]] convention). */
  private def readBuckets(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/buckets")
      .select(col("doc_id"), col("v"), col("nrm"),
        col("bucket").cast("long").as("bucket"))

  private def readChunks(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/chunks")
      .select(col("doc_id"), col("chunk_id"), col("v"), col("nrm"),
        col("bucket").cast("long").as("bucket"))

  /** MaxSim (late-interaction) top-k against the LANDED chunk artifact —
    * the passage-grain sibling of [[probeRetrievalIndex]]: bucket-gated
    * chunk pairs through the identical e6 kernel as the inline
    * maxsim_retrieval_lsh (shared oracle), masks sized from the landed
    * plane count, zero read-time hashing. */
  def probeRetrievalIndexMaxsim(s: SparkSession, indexDir: String,
      k: Int = 5): DataFrame =
    RetrievalOps.maxsimFromBucketedChunks(readChunks(s, indexDir), k,
      TextOps.DocProbeBits, readMeta(s, indexDir)._1)

  /** Hybrid RRF top-k against the LANDED index — zero corpus passes
    * beyond the artifact reads; every arithmetic step mirrors the
    * inline composition exactly (the dense leg runs the same
    * [[TextOps.docNeighborsLshCore]] as the inline key over the landed
    * buckets — bucket assignment is a pure function of v, so landed
    * and inline buckets are bit-identical). */
  def probeRetrievalIndex(s: SparkSession, indexDir: String,
      k: Int = RetrievalOps.PoolK): DataFrame = {
    val sh = s.read.parquet(s"$indexDir/postings")
    val sz = s.read.parquet(s"$indexDir/doclens")
    RetrievalOps.fuseRrf(
      TextOps.docNeighborsLshCore(readBuckets(s, indexDir),
        RetrievalOps.PoolK, TextOps.DocProbeBits,
        readMeta(s, indexDir)._1),
      RetrievalOps.lexicalFromPostings(sh, sz, RetrievalOps.PoolK), k)
  }

  /** The two ranked legs over the landed artifacts, separately — the
    * ScaleProbe hook (per-leg walls show BOTH legs tracking their
    * candidate volumes: cap-bounded posting pairs on the sparse side,
    * bucket collisions on the dense side — no |Q|·n term anywhere).
    * (dense, sparse). */
  def probeLegs(s: SparkSession, indexDir: String,
      k: Int = RetrievalOps.PoolK): (DataFrame, DataFrame) =
    (TextOps.docNeighborsLshCore(readBuckets(s, indexDir), k,
        TextOps.DocProbeBits, readMeta(s, indexDir)._1),
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
    // fingerprint in the memo key: a corpus regenerated at the same path
    // within one JVM rebuilds instead of serving a stale index; the
    // scratch dir is deleted at JVM exit (TempStores).
    builtIndexes.computeIfAbsent(
      s"$variant:$dir@${graft.TempStores.fingerprint(dir)}", _ => {
      val base = graft.TempStores.scratchDir(s"graft_retridx_$variant")
      buildRetrievalIndex(s, corpus(Tables.documents(s, dir)), base)
      s.catalog.clearCache()
      base
    })

  /** retrieval_index_probe — hybrid RRF retrieval over the landed
    * artifacts. Bit-identical to hybrid_retrieval (shared oracle). */
  def retrievalIndexProbe(s: SparkSession, dir: String): DataFrame =
    probeRetrievalIndex(s, ensureIndex(s, dir, "full")(identity))

  /** retrieval_index_probe_maxsim — late-interaction retrieval over the
    * SAME landed index (shared "full" build memo with
    * retrieval_index_probe — one build serves both probes). Bit-identical
    * to maxsim_retrieval_lsh (shared oracle). */
  def retrievalIndexProbeMaxsim(s: SparkSession, dir: String): DataFrame =
    probeRetrievalIndexMaxsim(s, ensureIndex(s, dir, "full")(identity))

  /** Idempotent index admission: append a batch of NEW documents
    * against the FROZEN artifacts — postings filtered to the frozen
    * kept-token vocabulary (build-time df decides membership; a fixed
    * vocabulary is the point of freezing, exactly like the frozen PQ
    * codebooks), doc lengths counted over kept tokens, vectors hashed
    * statelessly (the hash has no corpus state to freeze), buckets
    * derived from the fresh vectors and appended into their partition
    * leaves. EACH artifact computes its fresh rows by an anti-join
    * against its OWN landed doc_id set — never another artifact's — so
    * an at-least-once replay, full or after a crash between any two
    * appends, completes exactly the missing artifact(s) and appends
    * nothing twice. Returns the number of newly admitted documents
    * (the distinct union of docs that contributed to any artifact — a
    * doc can be postings-only, e.g. all-out-of-vocab tokens hash to a
    * zero-norm vector, or vectors-only). */
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
    val freshIds = (artifact: String, frame: DataFrame) =>
      frame.join(s.read.parquet(s"$indexDir/$artifact")
          .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val freshPost = freshIds("postings", batchTok)
    val freshLens = freshIds("doclens", RetrievalOps.lexicalDocLens(batchTok))
    val batchVecs = TextOps.docNeighborVectorsOf(batch)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freshVecs = freshIds("vectors", batchVecs)
    // buckets (and chunks) derive from the LANDED plane count —
    // appending a 6-plane bucket id into a 10-plane index would put the
    // doc where no probe ever looks
    val landedPlanes = readMeta(s, indexDir)._1
    val freshBkts = freshIds("buckets",
      batchVecs.withColumn("bucket",
        TextOps.docLshBucketN(col("v"), landedPlanes)))
    // chunk-grain leg: indexes landed before the chunks artifact existed
    // keep their flat surface (the compaction pre-buckets convention) —
    // admission never invents a chunks/ dir holding only batch docs
    val freshChunks =
      if (!java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$indexDir/chunks"))) None
      else Some(freshIds("chunks", TextOps.chunkVectorsOf(batch)
        .withColumn("bucket", TextOps.docLshBucketN(col("v"), landedPlanes))))
    // the distinct union of ALL artifacts' fresh contributors, so a
    // crash-heal replay that only completes doclens or buckets rows still
    // reports the docs it healed (the docstring's contract)
    val n = (Seq(freshPost, freshLens, freshVecs, freshBkts) ++ freshChunks)
      .map(_.select("doc_id")).reduce(_ unionByName _)
      .distinct().count()
    if (!freshPost.isEmpty)
      freshPost.select("doc_id", "tok")
        .write.mode("append").parquet(s"$indexDir/postings")
    if (!freshLens.isEmpty)
      freshLens.write.mode("append").parquet(s"$indexDir/doclens")
    if (!freshVecs.isEmpty)
      freshVecs.write.mode("append").parquet(s"$indexDir/vectors")
    if (!freshBkts.isEmpty)
      freshBkts.write.mode("append").partitionBy("bucket")
        .parquet(s"$indexDir/buckets")
    freshChunks.filter(!_.isEmpty).foreach(
      _.select("doc_id", "chunk_id", "v", "nrm", "bucket")
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$indexDir/chunks"))
    (Seq(batchTok, freshPost, freshLens, batchVecs, freshVecs, freshBkts)
      ++ freshChunks).foreach(_.unpersist())
    n
  }

  /** Per-JVM memo of COMPLETED admissions, keyed by index dir: admission
    * is replay-idempotent (RetrievalIndexSpec pins it), so once a keyed
    * call has admitted the growth batch into an index, later calls skip
    * the four per-artifact anti-join passes and isEmpty probes entirely —
    * the admitted probe's warm cost becomes probe cost plus nothing (the
    * r10 driver bench showed the no-op admission re-running at 27.9 s
    * under box contention). A FAILED admission un-memoizes itself, so
    * the next keyed call replays and heals — exactly the at-least-once
    * contract the per-artifact anti-joins exist for. */
  private val admittedOnce =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** BLOCKING once-per-store admission (r13): computeIfAbsent makes a
    * concurrent second key WAIT until the first finishes admitting —
    * the old non-blocking Set.add let retrieval_index_stats read the
    * shared "grown" store mid-admission under Verify's parallel
    * batches (its admitted-doc rows read 0 vs the oracle's 100). A
    * FAILED admission records no mapping, so the next keyed call
    * replays and heals — the at-least-once contract unchanged. */
  private def ensureAdmitted(s: SparkSession, idx: String)(
      batch: => DataFrame): Unit = {
    admittedOnce.computeIfAbsent(idx, _ => {
      admitToRetrievalIndex(s, idx, batch); java.lang.Boolean.TRUE
    })
    // EVERY caller — the admitting thread and the skip path alike —
    // drops any cached file listing of the store before reading it:
    // under concurrent sessions-worth of listing traffic, a listing
    // load in flight across an append's own invalidation can re-cache
    // the pre-append file set (observed once at the full parallel
    // surface: a stats panel read 0 admitted docs in every artifact
    // while the admit had completed). refreshByPath is a cheap
    // in-memory invalidation — correctness insurance, not a rebuild.
    s.catalog.refreshByPath(idx)
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
    ensureAdmitted(s, idx)(
      Tables.documents(s, dir).filter(col("doc_id") >= split))
    probeRetrievalIndex(s, idx)
  }

  /** retrieval_index_stats — the text-index HEALTH panel (the
    * [[AnnIndexOps.annIndexStats]] twin): a long-form (metric, value)
    * frame read off the LANDED artifacts plus one pass over the
    * admitted batch. The load-bearing row is `oov_e6` — the e6
    * fraction of the admitted docs' distinct (doc, token) pairs that
    * fall OUTSIDE the frozen kept vocabulary. Admission silently drops
    * those tokens (a fixed vocabulary is what freezing means), so a
    * rising oov_e6 is the signal that corpus vocabulary has drifted
    * from the build and the sparse leg is degrading: the REBUILD
    * trigger, exactly as rising reconstruction error is the ANN
    * index's. The artifact-size rows (postings/doclens/vectors/buckets
    * row counts, kept-vocab size, admitted-doc counts per leg) are the
    * consistency panel: doclens_docs must equal postings_docs and
    * buckets_docs must equal vectors_docs, or an admission crashed
    * between appends and the next replay hasn't healed it yet. All
    * values are exact BIGINTs (the one ratio is integer e6), so the
    * DuckDB twin — which RE-DERIVES every number from the documents
    * table and the split convention — hash-checks that the landed
    * index is exactly what a from-scratch build+admit would produce. */
  def retrievalIndexStats(s: SparkSession, dir: String): DataFrame = {
    val split = DedupOps.IncrementalSplit
    val idx = ensureIndex(s, dir, "grown")(_.filter(col("doc_id") < split))
    val batch = Tables.documents(s, dir).filter(col("doc_id") >= split)
    ensureAdmitted(s, idx)(batch)
    retrievalIndexStatsOf(s, idx, batch)
  }

  /** Panel core over any landed index + admitted-batch pair. Every
    * metric is a single-row aggregate; the bounded frames cross as
    * broadcast 1-row joins and stack to long form (the dq_checks
    * shape) — no driver-side action anywhere. */
  private[graft] def retrievalIndexStatsOf(s: SparkSession, indexDir: String,
      admitted: DataFrame): DataFrame = {
    // the landed sizing metadata joins the panel: `planes` (the adaptive
    // build-time LSH plane count the probes mask against) and
    // `built_docs` (the vector count the sizing saw) — the oracle twin
    // RE-DERIVES both from the documents table and the adaptivePlanes
    // rule, so the rule itself is hash-checked, not just recorded
    val (metaPlanes, metaBuilt) = readMeta(s, indexDir)
    val post = s.read.parquet(s"$indexDir/postings")
    val lens = s.read.parquet(s"$indexDir/doclens")
    val vecs = s.read.parquet(s"$indexDir/vectors")
    val bkts = s.read.parquet(s"$indexDir/buckets")
    val vocab = post.select("tok").distinct()
    val admIds = admitted.select("doc_id").distinct()
    val admTok = admitted
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val p = post.agg(count(lit(1)).as("postings_rows"),
      countDistinct(col("doc_id")).as("postings_docs"),
      countDistinct(col("tok")).as("kept_vocab_size"))
    val l = lens.agg(count(lit(1)).as("doclens_docs"))
    val v = vecs.agg(count(lit(1)).as("vectors_docs"))
    val b = bkts.agg(count(lit(1)).as("buckets_docs"))
    // docs with at least one landed chunk vector (0 for a pre-chunks
    // index — the panel shows the late-interaction leg is absent)
    val c = (if (java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$indexDir/chunks")))
        s.read.parquet(s"$indexDir/chunks")
          .agg(countDistinct(col("doc_id")).as("chunks_docs"))
      else s.range(1).select(lit(0L).as("chunks_docs")))
    val ls = lens.join(admIds, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("admitted_docs_sparse"))
    val vs = vecs.join(admIds, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("admitted_docs_dense"))
    val ao = admTok.join(vocab.withColumn("known", lit(1)), Seq("tok"), "left")
      .agg(count(lit(1)).as("admitted_pairs_total"),
        coalesce(sum(when(col("known").isNull, 1L).otherwise(0L)), lit(0L))
          .as("admitted_pairs_oov"))
    p.crossJoin(broadcast(l)).crossJoin(broadcast(v)).crossJoin(broadcast(b))
      .crossJoin(broadcast(c))
      .crossJoin(broadcast(ls)).crossJoin(broadcast(vs)).crossJoin(broadcast(ao))
      .withColumn("oov_e6", expr(
        "CASE WHEN admitted_pairs_total = 0 THEN 0L " +
          s"ELSE (admitted_pairs_oov * ${RetrievalOps.RrfScale}) div admitted_pairs_total END"))
      .select(expr(s"""stack(14,
          'admitted_docs_dense', admitted_docs_dense,
          'admitted_docs_sparse', admitted_docs_sparse,
          'admitted_pairs_oov', admitted_pairs_oov,
          'admitted_pairs_total', admitted_pairs_total,
          'buckets_docs', buckets_docs,
          'built_docs', ${metaBuilt}L,
          'chunks_docs', chunks_docs,
          'doclens_docs', doclens_docs,
          'kept_vocab_size', kept_vocab_size,
          'oov_e6', oov_e6,
          'planes', ${metaPlanes}L,
          'postings_docs', postings_docs,
          'postings_rows', postings_rows,
          'vectors_docs', vectors_docs) as (metric, value)"""))
      .orderBy("metric")
  }

  /** Fold admission's appended small files back into full-size ones:
    * the three flat artifacts compact whole ([[graft.Jobs.compactLeaf]]'s
    * crash-safe rename-pair), `buckets/` compacts per `bucket=` leaf
    * (the [[AnnIndexOps.compactAnnIndex]] pattern — partitioning, and
    * with it the probe's file pruning, is untouched). Directories that
    * never fragmented (≤1 parquet file) are skipped, so a quiet-day run
    * is a no-op. Concurrent-append GUARD (round 11): the read-then-swap
    * heals instead of discards — [[graft.Jobs.compactLeaf]] moves any
    * file appended between the scan and the rename into the rewritten
    * directory (spec-raced in Round11OpsSpec), so admission during
    * compaction loses nothing; it just stays unfolded until the next
    * pass. Returns the number of artifact directories rewritten
    * (buckets counts once however many leaves folded). */
  def compactRetrievalIndex(s: SparkSession, indexDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Path, Paths}
    def parquetCount(d: Path): Int = {
      val fs = Files.list(d)
      try fs.toArray.map(_.asInstanceOf[Path]).toSeq
        .count(_.getFileName.toString.endsWith(".parquet"))
      finally fs.close()
    }
    val flat = Seq("postings", "doclens", "vectors").count { a =>
      val d = Paths.get(s"$indexDir/$a")
      if (parquetCount(d) > 1) {
        graft.Jobs.compactLeaf(s, d.toString, targetFileBytes); true
      } else false
    }
    // indexes landed before the buckets/chunks artifacts existed have
    // only the flat layout — treat an absent directory as "nothing to
    // fold" instead of throwing NoSuchFileException mid-maintenance
    def foldLeaves(artifact: String): Int = {
      val bdir = Paths.get(s"$indexDir/$artifact")
      val leaves = if (!Files.isDirectory(bdir)) Seq.empty[Path] else {
        val st = Files.list(bdir)
        try st.toArray.map(_.asInstanceOf[Path]).toSeq
            .filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.startsWith("bucket="))
          finally st.close()
      }
      val folded = leaves.count { leaf =>
        if (parquetCount(leaf) > 1) {
          graft.Jobs.compactLeaf(s, leaf.toString, targetFileBytes); true
        } else false
      }
      if (folded > 0) 1 else 0
    }
    flat + foldLeaves("buckets") + foldLeaves("chunks")
  }

  /** retrieval_index_probe_compacted — the text-index LIFECYCLE in one
    * key: build on the corpus slice, admit the growth batch, COMPACT
    * the fragmented artifacts, probe. Pure layout — bit-identical to
    * `retrieval_index_probe_admitted` (shared oracle verbatim). */
  def retrievalIndexProbeCompacted(s: SparkSession, dir: String): DataFrame = {
    val split = DedupOps.IncrementalSplit
    val idx = ensureIndex(s, dir, "grown_compact")(_.filter(col("doc_id") < split))
    ensureAdmitted(s, idx)(
      Tables.documents(s, dir).filter(col("doc_id") >= split))
    compactRetrievalIndex(s, idx)
    // compaction renames files in place — drop cached listings before
    // the probe (the ensureAdmitted rationale)
    s.catalog.refreshByPath(idx)
    probeRetrievalIndex(s, idx)
  }
}
