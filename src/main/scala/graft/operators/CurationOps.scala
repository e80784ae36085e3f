package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus curation — the composed LLM training-data pipeline and the
  * deterministic sampling primitive that feeds downstream training runs.
  *
  * `corpus_filter` is the production shape end-to-end: quality scoring →
  * language-consistency filter → exact dedup, in ONE declarative plan.
  * The scoring stages are pure per-row projections (fused into the scan
  * by whole-stage codegen — zero shuffles), so the only shuffle in the
  * whole pipeline is the final dedup groupBy on the content hash. At
  * 100 TB that is a single exchange over the ~15% of rows that survive
  * the filters, with map-side partial aggregation.
  */
object CurationOps {

  /** Hashed-feature bucket count for [[targetAffinity]]. Must stay a
    * POWER OF TWO: the oracle buckets via unsigned HUGEINT `xh % B`
    * while Spark uses signed `pmod` — equal only when B is a bitmask of
    * the low bits (the doc_embed constraint). 256 buckets is plenty for
    * a language/domain-level affinity signal; raising it (DSIR uses
    * 10⁴) changes no plan shape. */
  val AffinityBuckets = 256
  /** The target distribution: English documents (the "I want my mix to
    * look like this" subset a data-selection pass upweights toward). */
  val AffinityTargetLang = "en"

  /** target_affinity — importance weighting against a TARGET subset
    * (the DSIR recipe, Xie et al. 2023: hashed n-gram importance
    * resampling): every token hashes into [[AffinityBuckets]] buckets;
    * the target subset (lang = [[AffinityTargetLang]]) and the whole
    * corpus each induce a bucket distribution; a document's affinity is
    * the mean likelihood ratio p_target(bucket)/p_corpus(bucket) over
    * its token occurrences, as an e6 integer. Docs whose token mix
    * looks like the target score > 10⁶, docs that don't score below —
    * the resampling weight a data-selection pass feeds to
    * [[mixtureSample]]-style samplers to steer the corpus toward the
    * target distribution without a trained model.
    *
    * Determinism: bucket ratios are doubles built from exact integer
    * counts with the op order mirrored verbatim in the oracle, floored
    * to e6 per BUCKET (256 values), so per-doc sums are integer sums —
    * order-independent — and the final mean is one integer division.
    * Invariant (spec): the corpus-weighted mean ratio telescopes to
    * exactly 1 (Σ_b c_b · t_b·C/(c_b·T) = C), so the overall mean
    * affinity is within floor-loss of 10⁶.
    *
    * Plan at 100 TB: two token-level scans (bucket counting, scoring),
    * ONE 256-row ratio broadcast, one doc_id-keyed partial-agg shuffle.
    * No joins wider than the broadcast; no per-token state. */
  def targetAffinity(s: SparkSession, dir: String): DataFrame =
    targetAffinityDocs(Tables.documents(s, dir))

  /** Core on any (doc_id, lang, text) frame (testable with planted
    * target-vocabulary twins). */
  def targetAffinityDocs(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("lang"),
        pmod(xxhash64(col("tok")), lit(AffinityBuckets.toLong)).as("b"))
    val cc = tok.groupBy("b").agg(
      count(lit(1)).cast("long").as("c_cnt"),
      sum(when(col("lang") === AffinityTargetLang, 1L).otherwise(0L))
        .cast("long").as("t_cnt"))
    val tot = cc.agg(sum("c_cnt").cast("long").as("c_total"),
      sum("t_cnt").cast("long").as("t_total"))
    val rt = cc.join(broadcast(tot))
      .select(col("b"),
        floor(((col("t_cnt").cast("double") * col("c_total")) /
            (col("c_cnt").cast("double") * col("t_total"))) * lit(1000000.0))
          .cast("long").as("ratio_e6"))
    val sc = tok.join(broadcast(rt), "b")
      .groupBy("doc_id")
      .agg(sum("ratio_e6").cast("long").as("score_sum"),
        count(lit(1)).cast("long").as("n_tok"))
    sc.join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"),
        (col("lang") === AffinityTargetLang).as("is_target"),
        col("n_tok"), expr("score_sum div n_tok").as("affinity_e6"))
      .orderBy("doc_id")
  }

  /** mix_drift — source-mix drift between two corpus drops (the
    * training-mix monitor a recurring ingest lands next to every batch:
    * a silently shifting source distribution skews the trained model
    * long before any per-document gate fires). Documents split into the
    * OLD drop (doc_id < [[graft.operators.DedupOps.IncrementalSplit]])
    * and the NEW one (same convention as dedup_incremental); per source
    * the report carries both token shares, the share delta, and each
    * side's chi-square contribution against the old mix as expectation.
    *
    * Exact-integer token sums on one (drop, source) partial-agg shuffle
    * over one scan; shares/chi² are divisions of exact ints with the
    * association mirrored in the oracle — hash-green. The drift verdict
    * rides the summed chi-square statistic over the bounded source
    * dimension. */
  def mixDrift(s: SparkSession, dir: String): DataFrame =
    mixDriftDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe entry point). */
  def mixDriftDocs(documents: DataFrame): DataFrame = {
    val cut = DedupOps.IncrementalSplit
    val toks = documents.select(col("source"),
      when(col("doc_id") < cut, lit("old")).otherwise(lit("new")).as("drop"),
      size(split(col("text"), " ")).cast("long").as("t"))
    val per = toks.groupBy("source").agg(
      sum(when(col("drop") === "old", col("t")).otherwise(0L)).as("t_old"),
      sum(when(col("drop") === "new", col("t")).otherwise(0L)).as("t_new"))
    // totals as an unpartitioned window over the COLLAPSED per-source
    // frame (the sourceMix pattern — bounded by the source dimension):
    // one scan, no second aggregation lineage
    val win = Window.partitionBy()
    val withTot = per
      .withColumn("n_old", sum(col("t_old")).over(win))
      .withColumn("n_new", sum(col("t_new")).over(win))
    val shareOld = col("t_old").cast("double") / col("n_old")
    val shareNew = col("t_new").cast("double") / col("n_new")
    // χ² contribution per source: (observed_new − expected_new)²/expected_new
    // with expected_new = old share × new total — exact-int operands.
    // A source absent from the OLD drop has no expectation to test
    // against (expected = 0): emit null χ² — the share columns carry the
    // new-source signal — rather than dividing by zero (Spark's non-ANSI
    // x/0.0 → null vs DuckDB's inf would also split the oracle).
    val expected = col("t_old").cast("double") * col("n_new") / col("n_old")
    val chi2 = when(col("t_old") > 0,
      (col("t_new").cast("double") - expected) *
        (col("t_new").cast("double") - expected) / expected)
    withTot
      .select(col("source"), col("t_old"), col("t_new"),
        shareOld.as("share_old"), shareNew.as("share_new"),
        (shareNew - shareOld).as("share_delta"),
        chi2.as("chi2_part"))
      .orderBy("source")
  }

  /** curation_report — the per-gate attrition funnel (the observability
    * frame every curation pipeline lands next to its output): documents
    * flow input → gopher rules → repetition gates → normalized dedup,
    * and each stage reports cumulative survivors + pass rate.
    *
    * Shape: the gate flags are per-row expressions computed by the
    * gate operators themselves (no second source of truth for gate
    * semantics); survivors dedup on the canonicalized hash with a
    * first-doc_id window; the four stage rows assemble from ONE
    * conditional aggregation over the flag frame (a report never
    * re-scans per stage). Exact integer counts, one division each →
    * oracle hash-green. */
  def curationReport(s: SparkSession, dir: String): DataFrame =
    curationReportDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe entry point). */
  def curationReportDocs(documents: DataFrame): DataFrame = {
    // every gate flag is a per-row expression, so the whole funnel is
    // ONE scan + one aggregation (countDistinct ignores the null norms
    // of non-survivors — and correctly yields 0, not null, when no
    // document survives both gates); the flag expressions are
    // spec-pinned to the standalone gate operators
    val c = funnelFlags(documents).agg(
      count(lit(1)).as("n_input"),
      sum(when(col("k_g"), 1L).otherwise(0L)).as("n_gopher"),
      sum(when(col("k_both"), 1L).otherwise(0L)).as("n_rep"),
      countDistinct(when(col("k_both"), col("norm"))).as("n_dedup"))
    stackFunnel(c)
  }

  /** The per-row gate-flag frame (k_g, k_both, norm) — THE single
    * source of the funnel's gate semantics, shared by the batch report
    * above and the streaming landing
    * ([[graft.streaming.EventStreams.landCurationFunnelStream]]). */
  def funnelFlags(documents: DataFrame): DataFrame = {
    val kG = TextOps.gopherKeepExpr(col("text"))
    val kR = TextOps.repetitionKeepExpr(col("text"))
    documents.select(kG.as("k_g"), (kG && kR).as("k_both"),
      DedupOps.normalizeText(col("text")).as("norm"))
  }

  /** Stack a one-row (n_input, n_gopher, n_rep, n_dedup) aggregate into
    * the canonical 4-stage funnel frame (the dq_checks pattern — a
    * union of per-stage selects would re-execute the whole
    * scan+aggregation once per stage; verified: 8 scans, no exchange
    * reuse). Shared with the streaming read-back
    * ([[graft.streaming.EventStreams.curationFunnelFromLanded]]) so the
    * two funnel frames cannot drift in shape. */
  def stackFunnel(c: DataFrame): DataFrame =
    c.select(expr("stack(4, " +
        "'1_input', n_input, '2_gopher', n_gopher, " +
        "'3_repetition', n_rep, '4_dedup_normalized', n_dedup) AS (stage, n_pass)"),
        col("n_input"))
      .select(col("stage"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_input")).as("pass_rate"))
      .orderBy("stage")

  /** corpus_filter — quality ≥ threshold, predicted language must agree
    * with the declared one (language confusion is a quality signal), then
    * exact dedup keeping the lowest doc_id per content hash. */
  def corpusFilter(s: SparkSession, dir: String, minQuality: Double = 0.5): DataFrame = {
    val kept = Tables.documents(s, dir)
      .withColumn("quality", TextOps.qualityExpr(col("text")))
      .withColumn("pred_lang", TextOps.predLangExpr(col("text")))
      .filter(col("quality") >= lit(minQuality) && col("pred_lang") === col("lang"))
    kept.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"),
        min_by(col("quality"), col("doc_id")).as("keep_quality"))
      .orderBy("h")
  }

  /** stratified_sample (rows-only) — per-stratum Bernoulli sampling keyed
    * on `xxhash64(doc_id, seed)`, NOT on `rand()`: the kept set is a pure
    * function of (doc_id, seed), so it is identical across reruns,
    * repartitions, and cluster sizes, and samples at different rates are
    * nested subsets of each other. That reproducibility is the contract a
    * training-data pipeline needs (rand()-based sampling shifts with
    * partitioning). Map-side only — no shuffle. */
  def stratifiedSample(s: SparkSession, dir: String,
      fractions: Map[String, Double] = Map("en" -> 0.5),
      defaultFraction: Double = 0.2, seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (lang, f)) =>
      when(col("lang") === lang, lit(f)).otherwise(acc)
    }
    // uniform in [0,1): low 20 bits of the keyed hash (independent of the
    // stratum column so per-stratum uniformity holds)
    val u = pmod(xxhash64(col("doc_id"), lit(seed)), lit(1048576L))
      .cast("double") / lit(1048576.0)
    Tables.documents(s, dir)
      .withColumn("_u", u)
      .filter(col("_u") < frac)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  val DecontMinShingles = 3L
  val EvalSource = "src0"

  /** #35g decontaminate — benchmark decontamination: flag training
    * documents sharing ≥ [[DecontMinShingles]] distinct word-3-gram
    * shingles with any document of the held-out evaluation set (here:
    * source = [[EvalSource]]). The eval side is the benchmark — tiny
    * relative to the corpus — so its shingle posting list BROADCASTS:
    * the train side never shuffles for the join; the only exchange is
    * the final partial-agg groupBy on doc_id. At 100 TB this is one
    * corpus scan + a broadcast probe, the only viable shape. */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminateDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def decontaminateDocs(docs: DataFrame, evalSource: String = EvalSource,
      minShared: Long = DecontMinShingles): DataFrame = {
    val evalSh = DedupOps.shingles(docs.filter(col("source") === evalSource))
      .select(col("doc_id").as("eval_id"), col("shingle"))
    val trainSh = DedupOps.shingles(docs.filter(col("source") =!= evalSource))
    trainSh.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id")
  }

  /** Overlap fraction above which [[decontaminateOverlap]] drops a
    * training document (the n-gram-overlap decontamination convention:
    * an absolute shared-shingle COUNT, as `decontaminate` uses, over-
    * flags long documents — a 10⁵-word page trivially shares 3 shingles
    * with some benchmark; a FRACTION of the doc's own shingles is
    * length-invariant). */
  val DecontOverlapTau = 0.5

  /** decontaminate_overlap — FRACTIONAL benchmark decontamination: every
    * training document scored by the share of its distinct word-3-gram
    * shingles that appear anywhere in the held-out eval set
    * (source = [[EvalSource]]), kept iff that share < [[DecontOverlapTau]].
    * The report twin of [[decontaminate]]'s hard count filter — emitting
    * EVERY train doc with its score lets curation tune τ without
    * re-running the scan.
    *
    * Scale shape: identical to `decontaminate` — the eval side is the
    * benchmark (tiny by construction), so its distinct shingle set
    * BROADCASTS; the train side is scanned once, its shingle explode
    * left-probes the broadcast, and the only exchange is the final
    * partial-agg groupBy on doc_id. Short docs (< 3 words, no shingles)
    * come back via the left join as overlap 0 / kept. */
  def decontaminateOverlap(s: SparkSession, dir: String): DataFrame =
    decontaminateOverlapDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def decontaminateOverlapDocs(docs: DataFrame,
      evalSource: String = EvalSource,
      tau: Double = DecontOverlapTau): DataFrame = {
    val evalSh = DedupOps.shingles(docs.filter(col("source") === evalSource))
      .select("shingle").distinct()
    val per = DedupOps.shingles(docs.filter(col("source") =!= evalSource))
      .join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
    val n = coalesce(col("n_shingles"), lit(0L))
    val shared = coalesce(col("n_shared"), lit(0L))
    val frac = when(n > 0, shared.cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    docs.filter(col("source") =!= evalSource).select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), n.as("n_shingles"), shared.as("n_shared"),
        frac.as("overlap_frac"), (frac < tau).as("kept"))
      .orderBy("doc_id")
  }

  /** contamination_report — the EVAL-side mirror of decontamination: for
    * each held-out document, how much of it already sits in the training
    * corpus (the leakage audit run BEFORE trusting a benchmark score).
    * Per eval doc: distinct-shingle count, how many of those shingles
    * occur in ≥ 1 train doc, that fraction, and the highest train
    * document-frequency among its contaminated shingles (1 doc = a
    * single leaked page; thousands = boilerplate, not leakage).
    *
    * Scale shape: the corpus is scanned ONCE — train shingles probe the
    * broadcast eval shingle set and collapse to per-shingle train-df,
    * an eval-bounded frame that broadcasts back onto the eval explode;
    * the only exchanges are the two eval-bounded partial aggs. Eval
    * docs with < 3 words have no shingles and no row (nothing to
    * audit). */
  def contaminationReport(s: SparkSession, dir: String): DataFrame =
    contaminationReportDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def contaminationReportDocs(docs: DataFrame,
      evalSource: String = EvalSource): DataFrame = {
    val evalSh = DedupOps.shingles(docs.filter(col("source") === evalSource))
      .select(col("doc_id").as("eval_id"), col("shingle"))
    // per-shingle train document frequency, ONLY for shingles the eval
    // set contains ([[DedupOps.shingles]] is distinct-per-doc, so a
    // plain count is the doc frequency)
    val trainDf = DedupOps.shingles(docs.filter(col("source") =!= evalSource))
      .join(broadcast(evalSh.select("shingle").distinct()), Seq("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("train_df"))
    evalSh.join(broadcast(trainDf), Seq("shingle"), "left")
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("train_df").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        max(coalesce(col("train_df"), lit(0L))).as("max_train_df"))
      .select(col("eval_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
          .as("contamination_frac"),
        col("max_train_df"))
      .orderBy("eval_id")
  }

  /** #35h dataset_split (*rows-only*: the 64-bit keyed hash is not
    * oracle-portable) — deterministic train/val/test assignment: the
    * split is a pure function of (doc_id, seed), so it is stable across
    * reruns, partitionings and cluster sizes, and ADDING documents never
    * flips an existing document's split (the eval-set stability contract
    * a training pipeline needs). 98/1/1 by hash bucket; map-side only,
    * zero shuffle. */
  def datasetSplit(s: SparkSession, dir: String, seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(col("doc_id"), lit(seed)), lit(10000L))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(bucket < 100, "test").when(bucket < 200, "val")
          .otherwise("train").as("split"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** source_mix — the data-mixture accounting pass: per (source, lang)
    * document / token / char totals plus each cell's share of corpus
    * tokens. ONE partial-agg shuffle on the fact; the share divides by a
    * window total over the COLLAPSED frame (bounded by sources × langs,
    * like the per-country aggregate — never the fact), so the corpus is
    * scanned exactly once. Token sums are exact longs; the one division
    * at the edge keeps shares deterministic. */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs_n"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens_n"),
        sum(col("n_chars")).as("chars_n"))
    // unpartitioned window over ≤ sources×langs rows — dimension-bounded
    val tot = sum(col("tokens_n")).over(Window.partitionBy())
    per.select(col("source"), col("lang"), col("docs_n"), col("tokens_n"),
        col("chars_n"),
        (col("tokens_n").cast("double") / tot).as("token_share"))
      .orderBy("source", "lang")
  }

  /** token_histogram — per-source power-of-two histogram of document
    * token counts: bucket = bit-length of the token count (an EXACT
    * integer log2 — `length(bin(n))`, identical in DuckDB, where
    * floor(log2(x)) in doubles is not ulp-portable). The
    * sequence-length panel that sizes packing ([[packSequences]]) and
    * spots truncation cliffs before a training run. One partial-agg
    * shuffle on (source, bucket) — output bounded by sources × ~20
    * buckets whatever the corpus size. */
  def tokenHistogram(s: SparkSession, dir: String): DataFrame =
    tokenHistogramDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe entry point). */
  def tokenHistogramDocs(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .select(col("source"), col("toks"),
        length(bin(greatest(col("toks"), lit(1L)))).cast("long").as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens_n"),
        min(col("toks")).as("min_toks"), max(col("toks")).as("max_toks"))
      .orderBy("source", "bucket")

  val MixAlpha = 0.5   // temperature exponent: p_i ∝ n_i^alpha
  val MixBudget = 0.5  // keep ~half the corpus overall

  /** mixture_sample (*rows-only*: pow + 64-bit keyed hash are not
    * oracle-portable) — temperature-based mixture resampling, the
    * multilingual-training rebalancing step: source i is kept at a rate
    * making expected contributions ∝ n_i^[[MixAlpha]] (big sources
    * down-weighted, small ones kept nearly whole), normalized so the
    * total expected keep is [[MixBudget]] of the corpus. Rates derive
    * from ONE partial-agg count per source and ride back on a broadcast
    * join; the accept decision is the same xxhash64(doc_id, seed) coin
    * as stratified_sample, so the kept set is reproducible across
    * reruns, partitionings, and corpus growth of OTHER sources. */
  def mixtureSample(s: SparkSession, dir: String,
      alpha: Double = MixAlpha, budget: Double = MixBudget,
      seed: Long = 42L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("src_n"))
    // normalizer Z = Σ n_i^alpha over the ≤ |sources| collapsed rows.
    // The window is ORDERED by source with an unbounded frame: the
    // double accumulation order is then the source sort order, not
    // whatever partitioning the shuffle produced — without it an
    // ulp-level reorder of Z could flip a doc whose coin lands exactly
    // on the rate boundary, breaking the reproducibility contract.
    val wAll = Window.partitionBy().orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val z = sum(pow(col("src_n").cast("double"), alpha)).over(wAll)
    val total = sum(col("src_n")).over(wAll)
    val rates = counts.select(col("source"), col("src_n"),
      least(lit(1.0),
        pow(col("src_n").cast("double"), alpha) / z *
          (total.cast("double") * budget) / col("src_n")).as("rate"))
    val u = pmod(xxhash64(col("doc_id"), lit(seed)), lit(1048576L))
      .cast("double") / lit(1048576.0)
    docs.join(broadcast(rates), "source")
      .filter(u < col("rate"))
      .select("doc_id", "source", "lang", "n_chars")
      .orderBy("doc_id")
  }

  val PackBudget = 512L
  val PackShards = 32L

  /** #35f pack_sequences — concat-and-split sequence packing: documents
    * are laid out in doc_id order within each of [[PackShards]]
    * deterministic shards and cut into fixed token-budget context
    * windows; each doc reports the window its first token lands in
    * (seq_id), its offset there, and how many windows it spans. Packing
    * per shard — not globally — is what a 1000-worker loader does anyway
    * (each worker packs its own shard), and it keeps the running-sum
    * window PARTITIONED: one keyed shuffle, no single-partition global
    * ordering at any scale. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable / probe-able). */
  def packSequencesDocs(docs: DataFrame): DataFrame =
    packSequencesCounts(docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens")))

  /** pack_sequences_bpe — packing over the LEARNED tokenizer's counts:
    * what a training loader actually packs is TOKENIZED sequences, and
    * whitespace counts under-budget them (BPE emits >1 token/word), so
    * this key closes the tokenize→pack seam — [[TokenizerOps.bpeTokens]]
    * (trained merges, per-distinct-word encode) supplies n_tokens and
    * the same per-shard window lays out the windows. Oracle composes the
    * unrolled BPE-training twin with the packing window SQL. Covers the
    * tokenized corpus (docs with ≥1 non-empty word — bpe_tokens's own
    * domain). */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame =
    packSequencesCounts(TokenizerOps.bpeTokens(s, dir)
      .select(col("doc_id"), col("n_tokens")))

  /** The shared per-shard packing window on any (doc_id, n_tokens)
    * frame: one keyed shuffle, no global sort (see [[packSequences]]). */
  def packSequencesCounts(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards)).as("shard"),
        col("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"cum_before div $PackBudget").as("seq_id"),
        pmod(col("cum_before"), lit(PackBudget)).as("seq_offset"),
        expr(s"(cum_before + n_tokens - 1) div $PackBudget - cum_before div $PackBudget + 1")
          .as("n_splits"))
      .orderBy("doc_id")
  }

  /** curriculum_stages — quality-curriculum staging, the training-order
    * step AFTER classifier filtering (data annealing: train on broad
    * data first, finish on the highest-quality band — the OLMo/MiniCPM
    * style recipe): the corpus splits into 4 quality quartiles by the
    * FROZEN quality head's logit ([[graft.operators.TextOps
    * .qualityModelScore]] is the single source of the score — no second
    * gate definition), and each stage reports its doc/token budget +
    * logit band, which is exactly what a training scheduler consumes.
    * Plan: the quartile boundaries come from ONE percentile aggregate
    * over the COLLAPSED distinct-logit frame (the quantile_buckets
    * pattern — no fact-wide sort), broadcast back for assignment; the
    * token-share ratio divides exact long sums over the 4-row collapsed
    * frame. Stage 1 = lowest-quality quartile. */
  def curriculumStages(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.TextOps.qualityModelScore(s, dir)
      .select(col("doc_id"), col("logit_e12"))
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
    val d = scored.join(toks, "doc_id")
    val bounds = d.groupBy("logit_e12").agg(count(lit(1)).as("cnt"))
      .agg(percentile(col("logit_e12"), typedLit(Seq(0.25, 0.5, 0.75)),
        col("cnt")).as("bs"))
    val staged = d.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("logit_e12"), col("toks"),
        aggregate(col("bs"), lit(1),
          (acc, b) => acc + when(col("logit_e12").cast("double") > b, 1)
            .otherwise(0)).cast("long").as("stage"))
    staged.groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("logit_e12")).as("min_logit_e12"),
        max(col("logit_e12")).as("max_logit_e12"))
      .withColumn("token_share", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(Window.partitionBy()))
      .orderBy("stage")
  }
}
