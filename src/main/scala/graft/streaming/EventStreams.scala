package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** Structured Streaming, SURVEY.md §2 #36.
  *
  * One aggregation definition serves both paths: the batch twin (oracle-
  * checked against DuckDB) and the streaming path (readStream + watermark,
  * exercised in ScalaTest through a memory source/sink). The watermark
  * bounds state: closed 1-hour windows are evicted after 2 hours of event
  * time, so state size is O(active windows × event types) regardless of
  * stream length.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window aggregation (count + exact-cents
    * sum). Works on any events-shaped frame, batch or streaming. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(Det.e2(col("value"))).cast("double") / lit(100.0)).as("v"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("v"))

  /** #36 stream_window_agg — batch twin for the correctness gate. */
  def streamWindowAggBatch(s: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.eventsMicros(s, dir)).orderBy("window_start", "event_type")

  /** Streaming path: watermarked version of the same aggregation. Feed it
    * a `readStream` frame (or a MemoryStream in tests) and attach a sink. */
  def streamWindowAgg(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", "2 hours"))

  /** Sliding 1-hour windows every 30 minutes — each event contributes to
    * two overlapping windows (the Expand is handled by the window
    * function itself). Same agg body as the tumbling variant. */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(Det.e2(col("value"))).cast("double") / lit(100.0)).as("v"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("v"))

  /** Native session windows (gap-based, per user) — the built-in
    * streaming counterpart of CoreOps.sessionize / sessionizeStream:
    * state merges adjacent windows within the gap and the watermark
    * closes sessions, all inside Spark's session_window machinery. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Det.e2(col("value"))).cast("double") / lit(100.0)).as("total_value"))
      .select(col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming exact dedup — drops re-deliveries of the same event id
    * from an at-least-once source. dropDuplicatesWithinWatermark keeps
    * state only until the watermark passes the event, so state is bounded
    * by (throughput × watermark), not stream length — the ingest-side
    * twin of DedupOps.dedupExact for an unbounded 100 TB/day feed. */
  def streamDedup(events: DataFrame, key: String = "event_id"): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(key)

  /** Streaming → landed-table handoff: each micro-batch of the
    * watermarked window aggregation appends into the same `dt=`-keyed
    * snappy-parquet layout the batch jobs land in (Jobs/SteamOps sink),
    * so a downstream batch reader sees one partition-pruned table
    * regardless of which path produced a drop. `dt` derives from each
    * window's EVENT TIME (a stream crossing midnight lands every window
    * under its own day, not the launch day). foreachBatch is the
    * idempotence seam: batchId is available for exactly-once sinks; here
    * append-only parquet suffices for the test contract. */
  def landWindowAgg(events: DataFrame, baseDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamWindowAgg(events).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .withColumn("dt", date_format(col("window_start"), "yyyy-MM-dd"))
          .write.mode("append").option("compression", "snappy")
          .partitionBy("dt")
          .parquet(baseDir)
      }
      .start()

  /** Streaming sketch landing — incremental distinct counting on an
    * unbounded feed: each micro-batch computes per-(day, event_type) HLL
    * sketches over ITS OWN rows and appends them dt-partitioned — the
    * streaming producer of [[graft.operators.SketchOps]]'s landed store.
    * Register-wise-max union makes this sound: the union of per-batch
    * partials equals the sketch of everything seen (no matter how rows
    * split across batches), so readers answer "distinct so far" by
    * merging KB-sized partials — state in the STREAM is zero (stateless
    * per-batch agg), state in the STORE is sketches, not ids. */
  def landSketchStream(events: DataFrame, baseDir: String, lgK: Int = 14)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").partitionBy("dt").parquet(baseDir)
      }
      .start()

  /** Streaming quantile-sketch landing — DDSketch partials per
    * (micro-batch, event_type): the landable-p99 pipeline on a stream.
    * Bucket-add merge is exact, so merging ALL landed partials
    * reproduces the one-shot sketch of the full history bit-for-bit
    * (below the collapse threshold) — the same union-soundness shape as
    * [[landSketchStream]]'s HLL registers and
    * [[landHeavyHitterStream]]'s MG summaries. Stream state: zero
    * (stateless per-batch agg); store state: Θ(batches × groups)
    * KB-sized sketch rows. */
  def landQuantileSketchStream(events: DataFrame, baseDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val dd = udaf(new graft.functions.DDSketch())
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(col("event_type"))
          .agg(dd(graft.functions.Det.e2(col("value")).cast("double")).as("sketch"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(baseDir)
      }
      .start()
  }

  /** Merge every landed quantile partial → per-type p50/p99 (cents).
    *
    * Replay safety: foreachBatch is at-least-once, and DDSketch
    * bucket-add is NOT idempotent (unlike HLL's register max), so a
    * re-landed batch_id must not merge twice — keep ONE sketch per
    * (event_type, batch_id) first. Like [[heavyHittersFromLanded]],
    * this relies on a replayed batch re-landing identical content
    * (true for deterministic sources). */
  def quantilesFromLanded(s: SparkSession, baseDir: String): DataFrame = {
    val ddm = udaf(new graft.functions.DDSketchMerge())
    val dd = graft.functions.DDSketch
    s.read.parquet(baseDir)
      .groupBy("event_type", "batch_id").agg(first(col("sketch")).as("sketch"))
      .groupBy("event_type")
      .agg(ddm(col("sketch")).as("sk"), count(lit(1)).as("n_partials"))
      .select(col("event_type"), col("n_partials"),
        dd.sortedEntries(col("sk")).as("e"))
      .select(col("event_type"),
        dd.quantileFromEntries(col("e"), 0.5).as("p50_cents"),
        dd.quantileFromEntries(col("e"), 0.99).as("p99_cents"),
        col("n_partials"))
      .orderBy("event_type")
  }

  /** Streaming curation-funnel landing — per-micro-batch mergeable
    * funnel partials: the observability twin of
    * [[graft.operators.CurationOps.curationReport]] on a document
    * stream (a recurring ingest lands its attrition telemetry next to
    * every batch instead of re-scanning history). The gate counts
    * (input / gopher / repetition) are EXACT per-batch sums — additive,
    * so the merged funnel is exact. The dedup stage is a cross-batch
    * DISTINCT over canonicalized content, which no additive counter can
    * carry, so each batch lands an HLL sketch of its surviving norms
    * (register-max union — idempotent on replay) and the merged stage
    * is an estimate within HLL tolerance. Gate flags are THE gate
    * operators' own expressions (gopherKeepExpr / repetitionKeepExpr /
    * normalizeText) — no second source of truth for gate semantics.
    * Stream state: zero (stateless per-batch agg); store state: one
    * KB-sized row per batch. */
  def landCurationFunnelStream(docs: DataFrame, baseDir: String,
      lgK: Int = 14): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // gate flags come from the SHARED funnelFlags frame — the batch
        // report and this landing cannot drift in gate semantics
        graft.operators.CurationOps.funnelFlags(batch)
          .agg(count(lit(1)).as("n_input"),
            sum(when(col("k_g"), 1L).otherwise(0L)).as("n_gopher"),
            sum(when(col("k_both"), 1L).otherwise(0L)).as("n_rep"),
            // nulls (gate-failed docs) are ignored by the sketch agg
            hll_sketch_agg(when(col("k_both"), col("norm")), lit(lgK))
              .as("norm_sketch"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(baseDir)
      }
      .start()

  /** Merge every landed curation-funnel partial → the 4-stage funnel
    * frame (same shape as the batch `curation_report`). Replay safety:
    * the exact sums are NOT idempotent, so one row per batch_id is kept
    * first (the [[quantilesFromLanded]] contract); the HLL union would
    * tolerate replay on its own but rides the same dedup. Cost:
    * O(#batches) rows — independent of the document volume they
    * summarize. */
  def curationFunnelFromLanded(s: SparkSession, baseDir: String): DataFrame = {
    val perBatch = s.read.parquet(baseDir)
      .groupBy("batch_id")
      .agg(first(col("n_input")).as("n_input"),
        first(col("n_gopher")).as("n_gopher"),
        first(col("n_rep")).as("n_rep"),
        first(col("norm_sketch")).as("norm_sketch"))
    val c = perBatch.agg(
      sum(col("n_input")).as("n_input"),
      sum(col("n_gopher")).as("n_gopher"),
      sum(col("n_rep")).as("n_rep"),
      // allowDifferentLgConfigK=true: a stream restarted with another
      // lgK must not make the landing dir unreadable (the union
      // downgrades to the coarser precision); all-null sketches (no
      // survivor in any batch) → 0 distinct, not null
      coalesce(hll_sketch_estimate(hll_union_agg(col("norm_sketch"), lit(true))),
        lit(0L)).as("n_dedup"))
    // same stacked 4-stage shape as the batch report — shared builder
    graft.operators.CurationOps.stackFunnel(c)
  }

  /** Streaming fuzzy admission — the ingest-time twin of
    * [[graft.operators.DedupOps.dedupMinhashIncremental]]: every
    * micro-batch of documents is screened against the LANDED corpus
    * index (band buckets under `indexDir/buckets`, hashed shingles under
    * `indexDir/shingles` — exactly the frames `bandBuckets`/
    * `hashedShingles` emit), verdicts land to `indexDir/verdicts`, and
    * the ADMITTED docs' buckets+shingles append to the index — so
    * micro-batch N+1 near-dup-checks against the corpus plus everything
    * admitted in 1..N. Rejected dups are not indexed (later copies still
    * match the original — the standard first-wins convention).
    *
    * foreachBatch is the production shape here: the admission kernel is
    * joins + aggs against a static index, which no single-pass streaming
    * state machine expresses, and the per-batch index append IS the
    * pipeline's output. Stream state: zero; store state: the index
    * (O(admitted corpus)).
    *
    * Replay safety: foreachBatch is at-least-once, so [[admitBatch]] is
    * written to be IDEMPOTENT. Docs whose verdict already landed are
    * anti-joined out before screening (a re-delivered batch re-lands
    * nothing and — crucially — never re-pairs an admitted doc with its
    * own index entry), and each index append anti-joins against the
    * doc_ids its target already contains, so a batch that died between
    * the verdict append and either index append completes exactly the
    * missing piece on redelivery. */
  def landAdmissionStream(docs: DataFrame, indexDir: String,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, indexDir, threshold)
      }
      .start()

  /** One micro-batch of [[landAdmissionStream]], exposed so the replay
    * contract is directly testable: calling this twice with the same
    * batch leaves verdicts and index byte-for-byte unchanged. */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
      threshold: Double): Unit = {
    import graft.operators.DedupOps
    val s = batch.sparkSession
    def readOr(path: String, ddl: String): DataFrame =
      if (new java.io.File(path).exists()) s.read.parquet(path)
      else s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    val bAll = batch.persist()
    val corpusB = readOr(s"$indexDir/buckets",
      "doc_id BIGINT, band INT, bucket BIGINT")
    val corpusSh = readOr(s"$indexDir/shingles", "doc_id BIGINT, hb BIGINT")
    val landed = readOr(s"$indexDir/verdicts",
      "doc_id BIGINT, dup_of_corpus BOOLEAN, dup_in_batch BOOLEAN, " +
        "keep BOOLEAN, batch_id BIGINT")
    // REPLAY GUARD: a doc verdicted by an earlier delivery is settled —
    // re-screening it against an index that may now contain its own
    // entry would flip keep→dup_of_corpus and land two contradictory
    // verdicts for one doc_id. localCheckpoint cuts the verdict-path
    // lineage so the append below can't recompute this frame.
    val bNew = bAll.join(landed.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val verdicts = DedupOps
      .admissionAgainstIndex(bNew, corpusB, corpusSh, threshold)
      .withColumn("batch_id", lit(batchId))
      .persist()
    verdicts.write.mode("append").parquet(s"$indexDir/verdicts")
    // Index forward every keep-verdicted doc of THIS batch — newly
    // screened or landed by a partially-failed earlier delivery — that
    // the target doesn't already contain. Per-target anti-joins make
    // each append individually idempotent. MATERIALIZE both frames
    // BEFORE the first append: appends fire recacheByPath on their
    // target, and a lazy frame still reading the index paths would
    // recompute against the half-updated index. localCheckpoint cuts
    // the file-reading lineage.
    val keepIds = verdicts.filter(col("keep")).select("doc_id")
      .unionByName(landed.filter(col("keep")).select("doc_id")
        .join(bAll.select("doc_id"), Seq("doc_id"), "left_semi"))
      .distinct()
    val admitted = bAll.join(keepIds, Seq("doc_id"), "left_semi")
    val newBuckets = DedupOps.bandBuckets(DedupOps.minhashSignatures(
        admitted.join(corpusB.select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")))
      .localCheckpoint()
    val newShingles = DedupOps.hashedShingles(
        admitted.join(corpusSh.select("doc_id").distinct(),
          Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    newBuckets.write.mode("append").parquet(s"$indexDir/buckets")
    newShingles.write.mode("append").parquet(s"$indexDir/shingles")
    verdicts.unpersist()
    bAll.unpersist()
    // the admission kernel persists its shingle frame internally —
    // a per-batch job must not leak blocks across batches
    s.catalog.clearCache()
  }

  /** Streaming SEMANTIC admission — the ingest-time twin of
    * [[graft.operators.ClusterOps.semanticDedupIncremental]], completing
    * the streaming-admission pair (exact/minhash text via
    * [[landAdmissionStream]], embedding space here): each micro-batch of
    * vectors is ASSIGNED against the frozen corpus-trained quantizer
    * (`baseDir/centroids`, landed once by
    * [[graft.operators.ClusterOps.initSemanticIndex]] — production
    * never retrains in the ingest path), screened against the LANDED
    * assigned index (`baseDir/index`) plus earlier docs of its own
    * batch, verdicts land to `baseDir/verdicts`, and ADMITTED vectors
    * append to the index — so batch N+1 semantic-dedups against corpus
    * + everything admitted before it. Stream state: zero; store state:
    * the index (O(admitted corpus)).
    *
    * Replay safety mirrors [[admitBatch]]: already-verdicted vec_ids
    * anti-join out before screening (and the kernel drops self-pairs),
    * the index append anti-joins against vec_ids already present, so
    * at-least-once redelivery completes exactly the missing piece. */
  def landSemanticAdmissionStream(emb: DataFrame, baseDir: String,
      threshold: Double = graft.operators.ClusterOps.SemThreshold)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitSemanticBatch(batch, batchId, baseDir, threshold)
      }
      .start()

  /** One micro-batch of [[landSemanticAdmissionStream]], exposed so the
    * replay contract is directly testable. */
  def admitSemanticBatch(batch: DataFrame, batchId: Long, baseDir: String,
      threshold: Double): Unit = {
    import graft.operators.ClusterOps
    val s = batch.sparkSession
    def readOr(path: String, ddl: String): DataFrame =
      if (new java.io.File(path).exists()) s.read.parquet(path)
      else s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    val cent = s.read.parquet(s"$baseDir/centroids") // required artifact
    val index = readOr(s"$baseDir/index",
      "vec_id BIGINT, embedding ARRAY<FLOAT>, nrm BIGINT, cluster BIGINT")
    val landed = readOr(s"$baseDir/verdicts",
      "vec_id BIGINT, cluster BIGINT, dup_of_corpus BOOLEAN, " +
        "dup_in_batch BOOLEAN, keep BOOLEAN, batch_id BIGINT")
    val bAll = batch.persist()
    // REPLAY GUARD (the admitBatch contract): a vector verdicted by an
    // earlier delivery is settled; localCheckpoint cuts the lineage so
    // the appends below can't recompute this frame mid-update.
    val bNew = ClusterOps.assignAgainst(
        bAll.join(landed.select("vec_id"), Seq("vec_id"), "left_anti"), cent)
      .localCheckpoint()
    val verdicts = ClusterOps.semanticVerdicts(bNew, index, threshold)
      .withColumn("batch_id", lit(batchId))
      .persist()
    verdicts.write.mode("append").parquet(s"$baseDir/verdicts")
    // admitted rows of THIS batch the index doesn't already hold —
    // newly kept, or kept by a delivery that died before its append
    val keptNow = bNew.join(verdicts.filter(col("keep")).select("vec_id"),
      Seq("vec_id"), "left_semi")
    val keptBefore = ClusterOps.assignAgainst(
      bAll.join(landed.filter(col("keep")).select("vec_id"),
        Seq("vec_id"), "left_semi"), cent)
    val newIndex = keptNow.unionByName(keptBefore)
      .join(index.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    newIndex.write.mode("append").parquet(s"$baseDir/index")
    verdicts.unpersist()
    bAll.unpersist()
    s.catalog.clearCache()
  }

  /** Streaming ANN-INDEX ingestion — the stream twin of
    * [[graft.operators.AnnIndexOps.admitToIndex]], completing the
    * landed-index family the way [[landSemanticAdmissionStream]]
    * completes semantic admission: each micro-batch of new vectors is
    * assigned against the FROZEN landed IVF-PQ artifacts (coarse cell +
    * M codes — zero retraining, two k-row broadcast reads) and appended
    * to `indexDir/codes` under the same vec_id anti-join, so an
    * at-least-once redelivery appends nothing and a delivery that died
    * mid-append completes exactly the missing rows on retry. Stream
    * state: zero; store state: the codes index (O(corpus) rows of
    * M+1 BIGINTs). Probes against the index see batch N's vectors from
    * batch N+1 on — the continuously-growing searchable corpus. */
  def landAnnIndexAdmissionStream(emb: DataFrame, indexDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.operators.AnnIndexOps.admitToIndex(s, indexDir, batch)
        // per-batch jobs must not leak persisted blocks across batches
        s.catalog.clearCache()
      }
      .start()

  /** Streaming TEXT-INDEX ingestion — the stream twin of
    * [[graft.operators.RetrievalIndexOps.admitToRetrievalIndex]],
    * completing the streaming-admission quadruple (minhash text /
    * embedding space / ANN index / text index): each micro-batch of new
    * documents is admitted against the FROZEN landed artifacts —
    * postings filtered to the frozen kept vocabulary, doc lengths over
    * kept tokens, stateless hashed vectors + their LSH buckets — with
    * each artifact's per-doc anti-join making an at-least-once
    * redelivery (full or after a crash between appends) append nothing
    * twice. Stream state: zero; store state: the four index artifacts.
    * Probes see batch N's docs from batch N+1 on — the continuously
    * growing searchable corpus, text-side. */
  def landRetrievalIndexAdmissionStream(docs: DataFrame, indexDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.operators.RetrievalIndexOps.admitToRetrievalIndex(s, indexDir, batch)
        // per-batch jobs must not leak persisted blocks across batches
        s.catalog.clearCache()
      }
      .start()

  /** Streaming GRAPH-LABEL ingestion — the stream twin of
    * [[graft.operators.GraphOps.incrementalComponents]], extending the
    * streaming-admission family to graph state: each micro-batch of
    * (doc_a, doc_b) edges folds into the landed (id, label) table by
    * CONTRACTION — batch endpoints map to their landed labels, CC runs
    * only on that batch-bounded contracted graph, and the merge mapping
    * rewrites just the touched components. The landed labels stay equal
    * to a full CC over every edge ever delivered (labels are component
    * minima, an iteration-order-free fixed point), so replaying a batch
    * is a no-op BY CONSTRUCTION: its edges contract to equal labels and
    * vanish — idempotence from the fixed point, not bookkeeping.
    * Stream state: zero; store state: O(nodes), rewritten via the
    * write-tmp-then-swap of compactLeaf (SINGLE WRITER during the swap,
    * same contract as compaction). */
  def landGraphAdmissionStream(edges: DataFrame, baseDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitGraphBatch(batch, batchId, baseDir)
      }
      .start()

  /** One micro-batch of [[landGraphAdmissionStream]], exposed so the
    * replay contract is directly testable. */
  def admitGraphBatch(batch: DataFrame, batchId: Long, baseDir: String): Unit = {
    val s = batch.sparkSession
    val labelsPath = s"$baseDir/labels"
    val labels0 =
      if (new java.io.File(labelsPath).exists()) s.read.parquet(labelsPath)
      else s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, label BIGINT"))
    // materialize the fold fully BEFORE touching the store (the result
    // reads labelsPath — an in-place overwrite would read-under-write)
    val next = graft.operators.GraphOps
      .foldIntoLabels(labels0, batch.select("doc_a", "doc_b"))
      .localCheckpoint()
    val tmp = s"$baseDir/labels_tmp_$batchId"
    next.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(labelsPath)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    if (!new java.io.File(tmp).renameTo(dir))
      throw new IllegalStateException(s"label swap failed: $tmp -> $labelsPath")
    // Land the EDGE SET too (round 12): labels answer "which component",
    // but PPR and walk generation need degrees — both re-derive from
    // `edges/` with zero extra stream state (walks are deterministic,
    // PPR seeds come from the dims), the parity Round12OpsSpec pins.
    // Append is idempotent the admitToIndex way: anti-join the batch
    // against landed edges so a replayed delivery appends nothing —
    // a duplicate edge row would silently shift every degree-derived
    // number downstream.
    val edgesPath = s"$baseDir/edges"
    val canon = batch
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b")).distinct()
    val freshEdges =
      if (new java.io.File(edgesPath).exists())
        // eager localCheckpoint: the anti-join reads edgesPath, and the
        // append below writes it — materialize fully before touching
        // the store (the labels-fold read-under-write lesson above)
        canon.join(s.read.parquet(edgesPath), Seq("doc_a", "doc_b"), "left_anti")
          .localCheckpoint()
      else canon
    freshEdges.write.mode("append").parquet(edgesPath)
    s.catalog.clearCache()
  }

  /** Streaming heavy hitters, landing side: each micro-batch lands its
    * own Misra–Gries candidate summary as (tok, w) rows plus the batch
    * token count. Soundness of the union: a token with global frequency
    * C > N·φ must satisfy c_i > n_i·φ in at least one batch (else
    * C = Σc_i ≤ φ·Σn_i = N·φ), and a batch's MG summary with capacity
    * ⌈1/φ⌉ keeps every token above that batch's n_i·φ — so the UNION of
    * landed candidates is a superset of every global heavy hitter, ready
    * for [[heavyHittersFromLanded]]'s exact verify. Stream state: zero
    * (stateless per-batch agg); store state: Θ(batches/φ) rows. */
  def landHeavyHitterStream(texts: DataFrame, baseDir: String,
      phi: Double = 0.01): org.apache.spark.sql.streaming.StreamingQuery = {
    val k = math.ceil(1.0 / phi).toInt
    texts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val mg = udaf(new graft.functions.MisraGries(k))
        batch.select(explode(split(col("text"), " ")).as("tok"))
          .agg(mg(col("tok")).as("sketch"), count(lit(1)).as("n_batch"))
          .select(explode(col("sketch")).as(Seq("tok", "w")), col("n_batch"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(baseDir)
      }
      .start()
  }

  /** Streaming heavy hitters, read side: exact counts over the corpus
    * restricted to the landed candidate union, thresholded at N·φ. N
    * comes from the STORE (one n_batch per landed batch, summed — that
    * is what the landing writes it for), so the corpus is scanned
    * exactly once, for the candidate counts. Output is EXACT (same rows
    * as a full groupBy+HAVING over all history) at candidate-sized
    * shuffle cost — the streaming twin of TextOps.heavyHitters. */
  def heavyHittersFromLanded(s: SparkSession, baseDir: String,
      corpus: DataFrame, phi: Double = 0.01): DataFrame = {
    val store = s.read.parquet(baseDir)
    val candidates = store.select("tok").distinct()
    // n_batch is denormalized onto each candidate row: recover one count
    // per batch as max(n_batch) — not distinct(batch_id, n_batch) — so a
    // foreachBatch REPLAY that lands a batch_id with a different row
    // count (possible for non-deterministic sources) contributes one N
    // term, never two
    val n = store.groupBy("batch_id").agg(max(col("n_batch")).as("nb"))
      .agg(sum(col("nb")).as("n"))
    corpus.select(explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(candidates), "tok")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .join(broadcast(n))
      .filter(col("c") > col("n") * lit(phi))
      .select("tok", "c")
      .orderBy("tok")
  }

  /** Read a [[landSketchStream]] store back: per-event_type distinct
    * estimate from merging every landed partial — O(#sketches) cost,
    * independent of the event volume they summarize. */
  def mergedSketchEstimate(s: SparkSession, baseDir: String): DataFrame =
    s.read.parquet(baseDir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("approx_users"))
      .orderBy("event_type")

  /** Stream-stream interval join — the streaming twin of
    * TemporalOps.rangeClickInPurchaseWindow: clicks matched to purchases
    * of the same user within [purchase.ts, purchase.ts + windowMinutes).
    *
    * Both sides are watermarked, and the join condition bounds c_ts
    * relative to p_ts in BOTH directions, so Spark can compute how long
    * each side's rows must be retained and evict state — the requirement
    * for an unbounded stream-stream join to run at all. State per side is
    * O(throughput × (watermark + window)), independent of stream length. */
  def clickPurchaseJoinStream(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks
      .select(col("event_id").as("c_event"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") < col("p_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_event"), col("c_event"), col("user_id"),
        col("c_ts"), col("p_ts"))
  }

  case class TypedEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelOut(user_id: Long, window_start: java.sql.Timestamp,
      steps_reached: Long)

  /** Streaming funnel — per ACTIVITY WINDOW: how far through view →
    * click-after-view → purchase-after-click a user got within one burst
    * of activity (idle past the gap closes the window). Events arrive out
    * of order across micro-batches, and funnel gating is order-SENSITIVE
    * (a late-arriving earlier view can change every later stage), so the
    * state buffers the window's (ts, type) pairs and the funnel resolves
    * ONCE, on event-time timeout — exactly the batch in-group
    * computation over that window's events, spec-asserted.
    *
    * Contract note: an unbounded stream cannot compute the all-time
    * batch funnel with bounded state — a user who returns after the gap
    * starts a NEW window (keyed by `window_start`), which is also the
    * semantics product funnels usually want. Equality with the batch
    * operator therefore holds per activity window, not per lifetime.
    * State per user is one window's events, removed on emit. */
  def funnelStream(events: org.apache.spark.sql.Dataset[TypedEvent],
      gapMinutes: Int = 60): org.apache.spark.sql.Dataset[FunnelOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def resolve(evs: Seq[(Long, String)]): Long = {
      val sorted = evs.sortBy(_._1)
      def firstAtOrAfter(t: Long, typ: String): Option[Long] =
        sorted.collectFirst { case (ts, ty) if ty == typ && ts >= t => ts }
      val t1 = firstAtOrAfter(Long.MinValue, "view")
      val t2 = t1.flatMap(firstAtOrAfter(_, "click"))
      val t3 = t2.flatMap(firstAtOrAfter(_, "purchase"))
      Seq(t1, t2, t3).count(_.isDefined).toLong
    }

    def update(userId: Long, rows: Iterator[TypedEvent],
        state: GroupState[List[(Long, String)]]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val buf = state.get
        val steps = resolve(buf)
        state.remove()
        Iterator.single(FunnelOut(userId,
          new java.sql.Timestamp(buf.map(_._1).min), steps))
      } else {
        val buf = state.getOption.getOrElse(Nil) ++
          rows.map(e => (e.ts.getTime, e.event_type))
        state.update(buf)
        state.setTimeoutTimestamp(buf.map(_._1).max + gapMs)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, n: Long, sumE2: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  /** Stateful streaming sessionization — the streaming twin of
    * CoreOps.sessionize. Custom per-user state via
    * flatMapGroupsWithState: a session closes when its user is idle past
    * the gap (event-time timeout), emitting one summary row. State per
    * key is O(1) (four longs), so total state is bounded by active users
    * — the shape that holds on an unbounded stream at cluster scale. */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMinutes: Int = 30): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      var closed = List.empty[SessionOut]
      if (state.hasTimedOut) {
        val st = state.get
        closed ::= SessionOut(userId, new java.sql.Timestamp(st.sessionStart),
          st.n, st.sumE2.toDouble / 100.0)
        state.remove()
      } else {
        var cur = state.getOption
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          val v = math.floor(e.value * 100.0 + 0.5).toLong
          cur match {
            case Some(st) if t - st.lastTs <= gapMs =>
              cur = Some(st.copy(lastTs = t, n = st.n + 1, sumE2 = st.sumE2 + v))
            case Some(st) =>
              closed ::= SessionOut(userId, new java.sql.Timestamp(st.sessionStart),
                st.n, st.sumE2.toDouble / 100.0)
              cur = Some(SessionState(t, t, 1, v))
            case None =>
              cur = Some(SessionState(t, t, 1, v))
          }
        }
        cur.foreach { st =>
          state.update(st)
          state.setTimeoutTimestamp(st.lastTs + gapMs)
        }
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-static geofence enrichment — the remaining streaming join
    * pattern (stream-stream interval join and stateful ops are above):
    * a stream of points joins the STATIC region table through the same
    * grid-cell equi-join as the batch spatial operator
    * ([[graft.operators.GeoOps.spatialJoinFrames]] — the core is shared,
    * streaming-agnostic). The static side broadcasts; the stream side
    * never shuffles and needs no watermark (stateless per-row
    * enrichment), so this runs at ingest throughput on any cluster —
    * the geofence-alert shape. */
  def geoAlertStream(points: DataFrame, boxes: DataFrame): DataFrame =
    graft.operators.GeoOps.spatialJoinFrames(boxes, points)
      .select(col("event_id"), col("px"), col("py"),
        col("n_nationkey").as("region_key"), col("n_name").as("region"))

  case class AttrEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String, value: Double)
  case class AttrOut(user_id: Long, purchase_ts: java.sql.Timestamp,
      event_id: Long, touch: String, cents: Long)
  /** carry = the user's last non-purchase touch from CLOSED windows
    * (null before the first); buf = the open activity window's events. */
  case class AttrState(carry: String, buf: List[(Long, Long, String, Long)])

  /** Streaming last-touch attribution — the streaming twin of
    * [[graft.operators.FeatureOps.attributionTouches]]. Attribution is
    * order-SENSITIVE (a late-arriving touch between two purchases
    * re-credits the second one), so like [[funnelStream]] the state
    * buffers the open activity window and resolves ONCE, on event-time
    * timeout, replaying the window's events in (ts, event_id) order
    * exactly as the batch window function does.
    *
    * Unlike the funnel, attribution DOES cross activity windows (a
    * morning ad click credits an afternoon purchase), so the resolved
    * window's final touch is carried forward as O(1) state and seeds the
    * next window — lifetime batch-equality per purchase, with state
    * bounded by (distinct users) + (open windows' events), never
    * all-time history. */
  def attributionStream(events: org.apache.spark.sql.Dataset[AttrEvent],
      gapMinutes: Int = 60): org.apache.spark.sql.Dataset[AttrOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[AttrEvent],
        state: GroupState[AttrState]): Iterator[AttrOut] = {
      if (state.hasTimedOut) {
        val st = state.get
        var carry = st.carry
        val outs = List.newBuilder[AttrOut]
        st.buf.sortBy(e => (e._1, e._2)).foreach { case (ts, id, ty, cents) =>
          if (ty == "purchase")
            outs += AttrOut(userId, new java.sql.Timestamp(ts), id,
              Option(carry).getOrElse("none"), cents)
          else carry = ty
        }
        // the window is resolved: drop its buffer, keep the O(1) carry
        // (no new timeout — the next event for this user sets one)
        state.update(AttrState(carry, Nil))
        outs.result().iterator
      } else {
        val st = state.getOption.getOrElse(AttrState(null, Nil))
        val buf = st.buf ++ rows.map(e => (e.ts.getTime, e.event_id,
          e.event_type, math.floor(e.value * 100.0 + 0.5).toLong))
        state.update(AttrState(st.carry, buf))
        state.setTimeoutTimestamp(buf.map(_._1).max + gapMs)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
