package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.operators.ClusterOps.{CoarseCells, CoarseRounds, PqK, PqM,
  PqNprobe, PqRounds, argminStruct, centArray, dist2, kmeansCentroids,
  quantized}

/** The LANDED IVF-PQ index — the production read path for ANN search.
  *
  * [[ClusterOps.annIvfPq]] trains its quantizers INSIDE every query
  * execution (correct by construction — the oracle demands deterministic
  * in-query training — but ~8 s of fixed overhead per query at sf0.1).
  * Production separates the two: a BUILD job trains once and lands three
  * artifacts, and every search/ingest afterwards only READS them:
  *
  *   `coarse/`     the cells×64 coarse centroid frame (k rows)
  *   `codebooks/`  M subspace codebooks, (subspace, cluster, c) — M×k rows
  *   `codes/`      the compressed corpus, (vec_id, c0..c_{M−1}),
  *                 PARTITIONED BY cell — a probe that touches nprobe of
  *                 `cells` cells reads only that fraction of the files
  *
  * [[probeAnnIndex]] (search) and [[assignToIndex]] (ingest assignment)
  * use the exact same integer arithmetic as the in-query twin, so the
  * landed path is bit-identical to [[ClusterOps.annIvfPq]] — the keyed
  * `ann_index_probe` shares ann_ivf_pq's unrolled DuckDB oracle
  * verbatim, and AnnIndexSpec asserts frame equality directly.
  *
  * Scale shape: build cost is the one-off training (per-round broadcast
  * assignment + k×dims-group shuffles — see ClusterOps); probe cost is
  * |Q|·(cells + M·k) broadcast-sized LUT work plus an equi-join against
  * only the probed cells' partitions; admission is O(batch) assignment
  * against frozen k-row artifacts with an idempotent anti-join append.
  * Nothing rescans or retrains on the corpus after build.
  */
object AnnIndexOps {

  /** Target per-cell occupancy for the adaptive build-time cell sizing
    * ([[adaptiveCells]]): cells sized so each coarse cell holds ~this
    * many vectors. 4096 keeps every test corpus (500–2000 vectors) at
    * the keyed [[CoarseCells]] = 8 — so the landed probes stay
    * bit-identical to the in-query ann_ivf_pq twin — while a 10⁹-vector
    * corpus sizes to ~2¹⁸ cells of ~4k vectors each instead of 8 cells
    * of 10⁸, where the probe's nprobe/cells candidate fraction would
    * degrade to a quarter-corpus scan. Fixed occupancy is the FAISS
    * IVF guidance shape (per-list size in the low thousands at billion
    * scale) expressed with the exact-integer ceil rule
    * [[graft.operators.TextOps.adaptivePlanes]] established. */
  val CellOccupancyTarget = 4096L

  /** Production cell count for a corpus of `n` vectors: the smallest
    * power of two `c` with [[CellOccupancyTarget]]·c ≥ n, floored at the
    * keyed [[CoarseCells]] — exact integer arithmetic (no float log₂
    * near a boundary). Power-of-two steps keep rebuild sizing stable
    * under small corpus drift. */
  def adaptiveCells(n: Long): Int = {
    var p = 0
    while ((CellOccupancyTarget << p) < n && p < 24) p += 1
    math.max(CoarseCells, 1 << p)
  }

  /** Train the IVF-PQ artifacts on `corpus` and land them under
    * `baseDir` — the one-off build job (run it per full corpus rebuild;
    * daily ingest goes through [[admitToIndex]] instead).
    *
    * `cells = 0` (the default) sizes the coarse cell count FROM THE
    * CORPUS at build time ([[adaptiveCells]]) and lands the sizing as
    * `meta/` (cells, built_vecs) alongside the data artifacts — the
    * health panel surfaces both so the sizing rule is oracle-checked,
    * and probes/admission read `coarse/` itself, so a resized build
    * stays consistent with every reader automatically. */
  def buildAnnIndex(corpus: DataFrame, baseDir: String,
      cells: Int = 0, crounds: Int = CoarseRounds, m: Int = PqM,
      k: Int = PqK, rounds: Int = PqRounds): Unit = {
    val dimsPer = 64 / m
    val qAll = quantized(corpus, normalize = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val builtVecs = qAll.count()
    val nCells = if (cells > 0) cells else adaptiveCells(builtVecs)
    val coarse = kmeansCentroids(qAll, nCells, crounds).localCheckpoint()
    coarse.write.mode("overwrite").parquet(s"$baseDir/coarse")
    qAll.sparkSession.range(1)
      .select(lit(nCells.toLong).as("cells"), lit(builtVecs).as("built_vecs"))
      .write.mode("overwrite").parquet(s"$baseDir/meta")
    // the M subspace codebooks train in ONE round loop
    // (kmeansCentroidsMulti — the checkpointed result serves the
    // codebook sink AND the code assignment); coarse trains separately
    // here because its cell count is adaptive and its artifact lands
    // first
    val centMulti = ClusterOps.kmeansCentroidsMulti(
      ClusterOps.pqTrainFrame(qAll, m, dimsPer, withCoarse = false),
      (0 until m).map(i => i -> k).toMap, rounds)
    centMulti.select(col("sub").as("subspace"), col("cluster"), col("c"))
      .write.mode("overwrite").parquet(s"$baseDir/codebooks")
    // cell + all M codes land from ONE map-side projection over the
    // persisted scan (the old shape shuffled the coarse assignment and
    // M per-subspace assignments, then joined all M+1 on vec_id)
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    val model = centArray(coarse).select(col("cents").as("ccents"))
      .crossJoin(ClusterOps.pqModelRow(centMulti, m, withCoarse = false))
    qAll.crossJoin(broadcast(model))
      .select(col("vec_id") +:
        argminStruct(col("v"), col("ccents")).getField("cluster").as("cell") +:
        (0 until m).map(i =>
          argminStruct(sub(i), col(s"cents$i")).getField("cluster")
            .as(s"c$i")): _*)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$baseDir/codes")
    qAll.unpersist()
  }

  /** The landed codes frame with the partition column normalized back to
    * the build-time long type (partition values round-trip as ints). */
  private def readCodes(s: SparkSession, indexDir: String, m: Int): DataFrame =
    s.read.parquet(s"$indexDir/codes")
      .select(col("vec_id") +: col("cell").cast("long").as("cell") +:
        (0 until m).map(i => col(s"c$i")): _*)

  /** ADC top-k search against the LANDED index — zero training jobs.
    * Query vectors are `emb`'s isQuery rows; every arithmetic step
    * (probe choice, LUT entries, code lookups, tie-breaks) mirrors
    * [[ClusterOps.annIvfPqFrom]] exactly, so the result is bit-identical
    * to the in-query-training composition over the same corpus. */
  def probeAnnIndex(s: SparkSession, indexDir: String, emb: DataFrame,
      topK: Int = 5, nprobe: Int = PqNprobe, m: Int = PqM,
      allQueries: Boolean = false): DataFrame = {
    val dimsPer = 64 / m
    val coarse = s.read.parquet(s"$indexDir/coarse")
    val books = s.read.parquet(s"$indexDir/codebooks")
    val codes = readCodes(s, indexDir, m)
      .withColumnRenamed("vec_id", "n_id")
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    // the landed artifacts collapse to ONE broadcast model row (coarse
    // cells + M codebooks as arrays). allQueries = every corpus vector
    // probes (the kNN-graph build for link_prediction_indexed);
    // default = the isQuery slice convention.
    val model = (centArray(coarse).select(col("cents").as("ccents")) +:
      (0 until m).map(i =>
        centArray(books.filter(col("subspace") === i).select("cluster", "c"))
          .select(col("cents").as(s"cents$i"))))
      .reduce(_ crossJoin _)
    // query side in ONE map-side projection: top-nprobe probed cells
    // (array_sort on (cd, cell) = the old window's total order, without
    // its |Q|·cells exchange) + the M ADC LUT maps. The old shape built
    // M separate broadcast LUT frames and joined each against the
    // candidates, then re-aggregated the M-way union on (q_id, n_id);
    // adist is now a map-side sum of M lookups and the only exchange
    // left after the cell join is the per-query top-k window.
    val probes = quantized(emb, normalize = true)
      .filter(if (allQueries) lit(true) else SimilarityOps.isQuery(col("vec_id")))
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
    // candidates: members of the probed cells only — the equi-join on
    // the partition column is what keeps the scan at nprobe/cells of
    // the corpus files
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

  /** Assign a batch of NEW vectors against the FROZEN landed artifacts:
    * coarse cell + M codes + exact integer reconstruction error, no
    * retraining (the ingest-side read path; [[admitToIndex]] appends the
    * result to the index). Pure — safe to key as a query. */
  def assignToIndex(s: SparkSession, indexDir: String, batch: DataFrame,
      m: Int = PqM): DataFrame = {
    val dimsPer = 64 / m
    val coarse = s.read.parquet(s"$indexDir/coarse")
    val books = s.read.parquet(s"$indexDir/codebooks")
    def sub(i: Int) = slice(col("v"), i * dimsPer + 1, dimsPer)
    // cell + M codes + reconstruction error in ONE map-side projection
    // against the frozen artifacts (the old shape shuffled M+1 separate
    // assignments and joined them all back on vec_id) — assignment is
    // now a zero-exchange scan of the batch, no persist needed
    val model = (centArray(coarse).select(col("cents").as("ccents")) +:
      (0 until m).map(i =>
        centArray(books.filter(col("subspace") === i).select("cluster", "c"))
          .select(col("cents").as(s"cents$i"))))
      .reduce(_ crossJoin _)
    quantized(batch, normalize = true)
      .crossJoin(broadcast(model))
      .select(col("vec_id") +:
        argminStruct(col("v"), col("ccents")).getField("cluster").as("cell") +:
        (0 until m).map(i => argminStruct(sub(i), col(s"cents$i")).as(s"m$i")): _*)
      .select(col("vec_id") +: col("cell") +:
        (0 until m).map(i => col(s"m$i.cluster").as(s"c$i")) :+
        (0 until m).map(i => col(s"m$i.d")).reduce(_ + _).as("err"): _*)
      .orderBy("vec_id")
  }

  /** Idempotent index admission: append the batch's codes, skipping
    * vectors already present (anti-join on vec_id) — an at-least-once
    * replay of the same batch appends nothing. Returns the number of
    * NEWLY admitted vectors. */
  def admitToIndex(s: SparkSession, indexDir: String, batch: DataFrame,
      m: Int = PqM): Long = {
    val assigned = assignToIndex(s, indexDir, batch, m).drop("err")
    val existing = s.read.parquet(s"$indexDir/codes").select("vec_id")
    val fresh = assigned.join(existing, Seq("vec_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK) // counted, then written
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("cell")
        .parquet(s"$indexDir/codes")
    fresh.unpersist()
    n
  }

  /** Per-JVM memo of built indexes: the build job runs ONCE per
    * (variant, corpus dir) and every subsequent keyed call is
    * probe-only — the production separation the keyed queries model
    * (Bench's warmup pass pays the build; the timed reps measure the
    * read path). */
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureIndex(s: SparkSession, dir: String, variant: String)(
      corpus: DataFrame => DataFrame): String =
    // fingerprint in the memo key: a corpus regenerated at the same path
    // within one JVM rebuilds instead of serving a stale index; the
    // scratch dir is deleted at JVM exit (TempStores).
    builtIndexes.computeIfAbsent(
      s"$variant:$dir@${graft.TempStores.fingerprint(dir)}", _ => {
      val base = graft.TempStores.scratchDir(s"graft_annidx_$variant")
      buildAnnIndex(corpus(Tables.embeddings(s, dir)), base)
      s.catalog.clearCache()
      base
    })

  /** The memoized full-corpus landed index for `dir` — exposed so other
    * operator families (link_prediction_indexed) can source neighbor
    * lists from the SAME build the probe keys share, instead of paying
    * a brute pair scan. */
  def fullIndex(s: SparkSession, dir: String): String =
    ensureIndex(s, dir, "full")(identity)

  /** ann_index_probe — top-k ADC search over the landed full-corpus
    * index. Bit-identical to ann_ivf_pq (shared oracle); the first call
    * per JVM lands the index, every later call only probes it. */
  def annIndexProbe(s: SparkSession, dir: String): DataFrame =
    probeAnnIndex(s, fullIndex(s, dir), Tables.embeddings(s, dir))

  /** ann_index_stats — the index HEALTH panel you read before trusting
    * probe results: per coarse cell, its member count, corpus share, and
    * the mean PQ reconstruction error of its members (exact integer err
    * sums; the one division at the edge). Unbalanced cells mean probe
    * cost variance and recall holes; rising err means the codebooks have
    * drifted from the corpus and the index needs a rebuild — exactly the
    * two numbers FAISS tells you to watch. Cell MEMBERSHIP comes from the
    * LANDED `codes/` frame (the index as it actually is, admitted rows
    * included); reconstruction error — which codes/ doesn't store — comes
    * from one assignment pass over the corpus against the frozen
    * quantizers, joined back on vec_id (a landed code whose vector has
    * left the corpus keeps its membership row and contributes no err). */
  def annIndexStats(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureIndex(s, dir, "full")(identity)
    annIndexStatsOf(s, idx, Tables.embeddings(s, dir))
  }

  /** Panel core over any landed index + corpus pair. The `cell = -1`
    * SENTINEL row counts corpus vectors NOT YET in `codes/` (embeddings
    * anti-join codes, share = fraction of the corpus invisible to the
    * panel): drifted vectors that were never admitted contribute neither
    * membership nor reconstruction error, so without this row a grown
    * corpus dulls the rebuild-trigger signal precisely when it matters —
    * rising unindexed share IS the admission-backlog alarm. Always 0 for
    * the keyed full variant (codes == corpus), nonzero on any sliced
    * index (spec-pinned).
    *
    * Two more sentinel rows surface the landed SIZING metadata (round
    * 12, the retrievalIndexStats `planes` convention): `cell = -2`
    * carries the landed coarse cell count and `cell = -3` the vector
    * count the sizing saw — the oracle twin RE-DERIVES both from the
    * embeddings table and the [[adaptiveCells]] rule, so the rule
    * itself is hash-checked, not just recorded. */
  private[graft] def annIndexStatsOf(s: SparkSession, idx: String,
      corpus: DataFrame): DataFrame = {
    val codes = readCodes(s, idx, PqM).select("vec_id", "cell")
    val errOf = assignToIndex(s, idx, corpus).select("vec_id", "err")
    val cells = codes.join(errOf, Seq("vec_id"), "left")
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("err")).as("err_sum"))
    val tot = cells.agg(sum(col("n")).as("n_total"))
    val perCell = cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n"),
        (col("n").cast("double") / col("n_total")).as("share"),
        (col("err_sum").cast("double") / col("n")).as("err_mean"))
    val corpusN = corpus.agg(count(lit(1)).as("corpus_n"))
    val unidx = corpus.select("vec_id")
      .join(codes.select("vec_id"), Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val sentinel = unidx.crossJoin(broadcast(corpusN))
      .select(lit(-1L).as("cell"), col("n"),
        (col("n").cast("double") / col("corpus_n")).as("share"),
        lit(null).cast("double").as("err_mean"))
    val meta = s.read.parquet(s"$idx/meta")
      .select(explode(array(
          struct(lit(-2L).as("cell"), col("cells").as("n")),
          struct(lit(-3L).as("cell"), col("built_vecs").as("n")))).as("m"))
      .select(col("m.cell"), col("m.n"),
        lit(null).cast("double").as("share"),
        lit(null).cast("double").as("err_mean"))
    meta.unionByName(sentinel).unionByName(perCell).orderBy("cell")
  }

  /** Per-JVM memo of COMPLETED admissions, keyed by index dir — the
    * [[RetrievalIndexOps]] convention: admission is replay-idempotent
    * (AnnIndexSpec pins it), so later keyed calls skip the anti-join +
    * count pass once a batch has landed; a FAILED admission un-memoizes
    * so the next call replays and heals. */
  private val admittedOnce =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** BLOCKING once-per-store admission (r13): computeIfAbsent makes a
    * concurrent second key WAIT until the first finishes admitting —
    * the old non-blocking Set.add let a sibling key read the store
    * mid-admission under Verify's parallel batches (caught as a
    * retrieval_index_stats hash flake: admitted-doc rows read 0 while
    * the admit was in flight). A FAILED admission records no mapping,
    * so the next keyed call replays and heals — the at-least-once
    * contract unchanged. */
  private def ensureAdmitted(s: SparkSession, idx: String)(
      batch: => DataFrame): Unit = {
    admittedOnce.computeIfAbsent(idx, _ => {
      admitToIndex(s, idx, batch); java.lang.Boolean.TRUE
    })
    // invalidate any cached file listing of the store for this caller
    // before it reads — the RetrievalIndexOps.ensureAdmitted rationale
    s.catalog.refreshByPath(idx)
  }

  /** ann_index_probe_admitted — the GROW-THEN-SEARCH loop end to end:
    * the index artifacts froze on the corpus slice (vec_id < SemSplit),
    * the post-build batch is admitted through [[admitToIndex]] (an
    * idempotent no-op after the first call), and the probe then
    * searches corpus + admitted vectors together — proving that what
    * streaming/batch admission lands is immediately searchable with
    * NO retraining. The oracle is the IVF-PQ twin with every quantizer
    * trained on the corpus slice and codes covering everyone. */
  def annIndexProbeAdmitted(s: SparkSession, dir: String): DataFrame = {
    val split = ClusterOps.SemSplit
    val idx = ensureIndex(s, dir, "grown")(_.filter(col("vec_id") < split))
    ensureAdmitted(s, idx)(
      Tables.embeddings(s, dir).filter(col("vec_id") >= split))
    probeAnnIndex(s, idx, Tables.embeddings(s, dir))
  }

  /** Fold admission's appended small files back into full-size ones,
    * one `cell=` leaf at a time ([[graft.Jobs.compactLeaf]]'s crash-safe
    * rename-pair per leaf) — the nightly INDEX maintenance twin of the
    * table-side `runMaintenanceJob`. Every admitted batch appends its
    * own file(s) into each touched cell partition; at a daily ingest
    * cadence a year is ~365 files per cell, and probe cost at 100 TB is
    * dominated by per-file scheduling before a single row is read.
    * Compaction rewrites ROWS UNCHANGED (the spec pins probe-frame
    * equality), touches only leaves that actually fragmented (≤1-file
    * cells skip — so re-running after a quiet day is a no-op), and
    * leaves the cell partitioning intact (DPP pruning unaffected).
    * Concurrent-append GUARD (round 11): the per-leaf read-then-rename
    * swap no longer discards files appended between the scan and the
    * swap — [[graft.Jobs.compactLeaf]] diffs the swapped-out directory
    * against the exact file set the scan captured and moves any
    * concurrently appended files into the rewritten leaf (spec-raced in
    * Round11OpsSpec). Admission during compaction now costs only an
    * unfolded file until the next pass; stopping admission remains the
    * tidy choice, not a correctness requirement. Returns the number of
    * leaves rewritten. */
  def compactAnnIndex(s: SparkSession, indexDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Path, Paths}
    val codes = Paths.get(s"$indexDir/codes")
    val st = Files.list(codes)
    val cells = try st.toArray.map(_.asInstanceOf[Path]).toSeq
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("cell="))
      finally st.close()
    cells.count { c =>
      val fs = Files.list(c)
      val n = try fs.toArray.map(_.asInstanceOf[Path]).toSeq
          .count(_.getFileName.toString.endsWith(".parquet"))
        finally fs.close()
      if (n > 1) { graft.Jobs.compactLeaf(s, c.toString, targetFileBytes); true }
      else false
    }
  }

  /** ann_index_probe_compacted — the full index LIFECYCLE in one key:
    * build on the corpus slice, admit the growth batch, COMPACT the
    * fragmented cell leaves, then probe. Compaction is pure layout —
    * the result is bit-identical to `ann_index_probe_admitted` (shared
    * oracle verbatim), which is exactly the property that makes it safe
    * to run nightly. */
  def annIndexProbeCompacted(s: SparkSession, dir: String): DataFrame = {
    val split = ClusterOps.SemSplit
    val idx = ensureIndex(s, dir, "grown_compact")(_.filter(col("vec_id") < split))
    ensureAdmitted(s, idx)(
      Tables.embeddings(s, dir).filter(col("vec_id") >= split))
    compactAnnIndex(s, idx)
    // compaction renames files in place — drop cached listings before
    // the probe (the ensureAdmitted rationale)
    s.catalog.refreshByPath(idx)
    probeAnnIndex(s, idx, Tables.embeddings(s, dir))
  }

  /** ann_index_admit — the ingest side: vectors arriving AFTER the index
    * build (vec_id ≥ SemSplit, the shared admission split) are assigned
    * against the FROZEN corpus-slice artifacts — cell, M codes, exact
    * reconstruction error — with zero retraining. The oracle trains its
    * unrolled twin on the same corpus slice and assigns everyone;
    * AnnIndexSpec proves the append path is replay-idempotent. */
  def annIndexAdmit(s: SparkSession, dir: String): DataFrame = {
    val split = ClusterOps.SemSplit
    val idx = ensureIndex(s, dir, "corpus")(_.filter(col("vec_id") < split))
    assignToIndex(s, idx,
      Tables.embeddings(s, dir).filter(col("vec_id") >= split))
  }
}
