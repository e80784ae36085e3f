package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.VectorFunctions.{dotE12, normE12}

/** Deduplication operators over the `documents` / `embeddings` tables,
  * SURVEY.md §2 #24–28 — the LLM-training-data core.
  *
  * Scale design (SURVEY.md §5): exact dedup is ONE shuffle on the content
  * hash; MinHash-LSH shuffles on (band, bucket) and only ever materializes
  * candidate pairs (never O(n²)); SimHash buckets on 16-bit bands of the
  * 64-bit signature; exact n-gram Jaccard and brute-force embedding cosine
  * are the correctness baselines that, at 100 TB, run *after* an LSH
  * prefilter (ops #25 / #30) has cut the pair space.
  */
object DedupOps {

  /** #24 dedup_exact — hash-groupBy on md5(text), keep min doc_id.
    * One shuffle on the hash key; map-side partial agg does the heavy
    * lifting at scale. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("h")

  /** dedup_normalized — canonicalize-then-hash dedup (the C4/RefinedWeb
    * normalization step): case-fold, strip everything outside
    * [a-z0-9 ], collapse whitespace runs, trim — THEN hash-group. Catches
    * the trivial variants byte-exact dedup misses (case, punctuation,
    * spacing) at identical cost: the normalization is a codegen'd
    * per-row projection, the dedup still one hash-key shuffle. */
  def dedupNormalized(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(normalizeText(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("h")

  /** The shared canonicalization (mirrored in the oracle SQL). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Documents with `doc_id < this` stand in for the already-ingested
    * corpus in [[dedupIncremental]]; the rest are the "new batch".
    * Mirrored verbatim in the oracle SQL. */
  val IncrementalSplit = 400L

  /** dedup_incremental — the production ingest shape: dedup a NEW BATCH
    * of documents against an EXISTING corpus without ever re-pairing the
    * corpus with itself. Each new doc is flagged `dup_of_corpus` (its
    * content hash already exists in the corpus) and/or `dup_in_batch`
    * (an earlier new doc in the same batch has the same hash); `keep` is
    * the admission verdict. daily-ingest cost is O(batch + corpus) ONCE
    * on the hash key — at 100 TB the corpus side is a pre-bucketed hash
    * index you ANTI-JOIN against (corpus never re-shuffles against
    * itself, unlike a full-corpus re-dedup), and the in-batch window is
    * keyed by hash so it shuffles only the (small) batch.
    *
    * Reference analogue: the latest-drop ingest path
    * (external_resources.py:91–99 picks the newest object and appends) —
    * this is what admission control for that append becomes at scale. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame =
    dedupIncrementalFrom(Tables.documents(s, dir), IncrementalSplit)

  /** Admission core on any documents-shaped frame (testable). */
  def dedupIncrementalFrom(docs: DataFrame, split: Long): DataFrame = {
    val hashed = docs.withColumn("h", md5(col("text")))
    val corpusHashes = hashed.filter(col("doc_id") < split)
      .select(col("h")).distinct()
    val batch = hashed.filter(col("doc_id") >= split)
    val wBatch = Window.partitionBy("h").orderBy("doc_id")
    batch
      .join(corpusHashes.withColumn("in_corpus", lit(true)), Seq("h"), "left")
      .withColumn("dup_of_corpus", coalesce(col("in_corpus"), lit(false)))
      .withColumn("dup_in_batch", row_number().over(wBatch) > 1)
      .select(col("doc_id"), col("h"),
        col("dup_of_corpus"), col("dup_in_batch"),
        (!col("dup_of_corpus") && !col("dup_in_batch")).as("keep"))
      .orderBy("doc_id")
  }

  /** Word-k-gram array over a text column — THE gram definition, shared
    * by [[shingles]] and [[graft.operators.TextOps.ngramCounts]] (and
    * mirrored by their oracle SQL) so tokenization can never diverge
    * between operators. Multiplicity kept; wrap in `array_distinct` for
    * set semantics. Total: texts with fewer than k tokens yield an empty
    * array (without the guard, sequence(0, size-k) would run DESCENDING
    * and element_at would hit index 0 — a mid-job crash). */
  def wordGrams(text: Column, k: Int): Column = {
    // `w` must be a LAMBDA VARIABLE, not a named expression: Catalyst
    // substitutes a named Column into every reference inside the gram
    // lambda, so element_at(split(text), ·) would re-split the ENTIRE
    // text once per gram — O(L²) per document (LongDocSpec caught a
    // 10⁷-char doc pegging a core for 13+ min; the winnowing lesson,
    // SURVEY §5, applied one level deeper). Routing the split through a
    // one-element transform binds the array once per row; each gram is
    // then an O(k) slice + join.
    val grams = transform(array(split(text, " ")), w =>
      when(size(w) >= k,
        transform(
          sequence(lit(0), size(w) - k),
          i => array_join(slice(w, i + 1, lit(k)), " ")))
        .otherwise(array().cast("array<string>")))
    element_at(grams, 1)
  }

  /** doc_id + distinct word-k-gram shingles, exploded. */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.filter(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(wordGrams(col("text"), k))).as("shingle"))

  val MinhashK = graft.functions.MinHash32.K // 32: 8 bands x 4 rows
  val MinhashBands = 8

  /** Buckets larger than this are skipped during pair expansion: a bucket
    * with thousands of members is boilerplate (every member pairs with
    * every other — O(n²) pairs carrying no dedup signal), and production
    * dedup pipelines drop them. Bounds both memory per group and output. */
  val MaxBucket = 1024

  /** All (a,b) pairs (a<b) from a sorted id array, as a codegen-friendly
    * nested-transform expression — turns a bucketed self-join into a
    * single groupBy: one pipeline, one shuffle, no recomputation of the
    * signature stage on both join sides. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(
      sequence(lit(0), size(ids) - 2),
      i => transform(
        slice(ids, i + 2, size(ids)),
        b => struct(element_at(ids, i + 1).as("a"), b.as("b")))))

  /** Group bucketed rows → bounded sorted member lists → explode in-bucket
    * pairs. `keys` are the bucket columns. */
  private def bucketPairs(buckets: DataFrame, keys: Seq[String]): DataFrame =
    buckets
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= MaxBucket)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))

  /** doc_id + 64-bit hashed shingles — the shared base frame for MinHash
    * signatures AND exact-Jaccard verification (one definition, so both
    * consumers agree and AQE can reuse the subtree where plans allow). */
  def hashedShingles(docs: DataFrame): DataFrame =
    shingles(docs).select(col("doc_id"), xxhash64(col("shingle")).as("hb"))

  /** Per-doc MinHash signature: K independent hash slots, each the min of
    * a seeded xxhash64 over the doc's shingles — computed by the native
    * one-pass expression [[graft.functions.MinHash32]] as a pure
    * projection (`sig` = array of K longs). The previous formulation
    * (shingle explode → groupBy with K min aggregates) was identical math
    * through a shuffle; spec-asserted bit-for-bit equal. Docs with < 3
    * tokens have no shingles → dropped, as the explode produced no row. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.MinHashFunctions.minhash32(col("text")).as("sig"))
      .filter(col("sig").isNotNull)

  /** #25 dedup_minhash_lsh (rows-only) — banded LSH: band hash = hash of 4
    * consecutive signature slots; docs sharing any (band, bucket) become
    * candidate near-dup pairs. The join key is (band, bucket) so the
    * shuffle is bounded by candidate density, never all-pairs. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashCandidates(Tables.documents(s, dir))

  /** Candidate generation on any documents-shaped frame (testable core). */
  def minhashCandidates(docs: DataFrame): DataFrame =
    minhashCandidatesFrom(minhashSignatures(docs))

  /** (doc_id, band, bucket) rows from a signature frame — band hash =
    * xxhash64 of the band's consecutive signature slots. Shared by the
    * full-corpus candidate join and the incremental batch-vs-corpus
    * admission path. */
  def bandBuckets(sigs: DataFrame): DataFrame = {
    val rows = MinhashK / MinhashBands // slots per band
    val bands = (0 until MinhashBands).map { b =>
      val slot = (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
      struct(lit(b).as("band"), xxhash64(slot: _*).as("bucket"))
    }
    sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Banded candidate generation from a signature frame (`sig` array). */
  def minhashCandidatesFrom(sigs: DataFrame): DataFrame =
    bucketPairs(bandBuckets(sigs), Seq("band", "bucket"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")

  /** 64-bit SimHash per document: per-bit signed vote of each token's
    * xxhash64, sign → bit — computed by the native codegen expression
    * [[graft.functions.SimHash64]] as a pure projection fused into the
    * scan. The previous formulation (explode + 64-column vote aggregate)
    * was identical math through a shuffle; this one touches each document
    * exactly once with zero exchanges. */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashFunctions.simhash64(col("text")).as("simhash"))

  /** #26 dedup_simhash (rows-only) — 16-bit band bucketing over the 64-bit
    * SimHash, then exact hamming distance (bit_count of xor) on candidates.
    * A near-dup within hamming 16 of any band match is surfaced. */
  def dedupSimhash(s: SparkSession, dir: String, maxHamming: Int = 16): DataFrame =
    simhashPairs(Tables.documents(s, dir), maxHamming)

  /** SimHash near-dup pairs on any documents-shaped frame (testable core). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simhashSignatures(docs)
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), 16 * b).bitwiseAND(lit(0xffffL)).as("bucket"))
    }
    // same one-shuffle bucket-grouping shape as minhash, with the
    // signature carried through the member structs (sorted by doc_id, so
    // pair order a<b holds)
    val buckets = sigs
      .select(col("doc_id"), col("simhash"), explode(array(bands: _*)).as("bb"))
      .select(struct(col("doc_id"), col("simhash")).as("m"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    buckets
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("m"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= MaxBucket)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Shingles occurring in more than this many documents are dropped from
    * the Jaccard representation entirely (sizes AND intersections): a
    * boilerplate shingle in k docs yields k²/2 join rows carrying no dedup
    * signal — the exact-baseline twin of [[MaxBucket]]. The test corpus
    * never reaches this df, so results are unchanged there; at 100 TB it
    * bounds the per-shingle fan-out. */
  val MaxShingleDf = 1024

  /** #27 dedup_ngram_jaccard — EXACT word-3-gram Jaccard pairs via the
    * per-shingle inverted index, never a doc×doc cross join. At 100 TB
    * this runs on MinHash-LSH candidates; here it is the full correctness
    * baseline with a DuckDB oracle (which applies the same df cutoff). */
  def dedupNgramJaccard(s: SparkSession, dir: String, threshold: Double = 0.5,
      maxShingleDf: Int = MaxShingleDf): DataFrame =
    ngramJaccardPairs(Tables.documents(s, dir), threshold, maxShingleDf)

  /** Exact Jaccard pair computation on any documents-shaped frame.
    *
    * Shape: ONE shuffle groups the 64-bit shingle hashes (~3x smaller than
    * strings; collisions ~2^-45 at this vocabulary — exactness holds, the
    * DuckDB oracle joins raw strings and hash-matches this output) into
    * per-shingle posting lists; lists above `maxShingleDf` are dropped
    * (hot-shingle cap — see [[MaxShingleDf]]); in-list pair expansion then
    * replaces the classic inverted-index SELF-join, so the shingle
    * pipeline runs once, not twice, and fan-out per shingle is bounded by
    * df². Sizes are counted over the KEPT shingles, so the score is a true
    * Jaccard over the capped representation.
    *
    * The posting-list frame is persisted — it feeds both the sizes
    * aggregate and the pair expansion in the RETURNED lazy plan, so this
    * call cannot unpersist it. Contract: the caller drops it (e.g.
    * `spark.catalog.clearCache()`) once the result is consumed, as
    * Verify/Bench do per query. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      maxShingleDf: Int = MaxShingleDf): DataFrame =
    shinglePairStats(docs, maxShingleDf)
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

  /** Shared posting-list pair core: (doc_a < doc_b, common, na, nb) over
    * the df-capped shingle representation — the candidate frame both
    * [[ngramJaccardPairs]] and [[containmentPairs]] score. */
  private def shinglePairStats(docs: DataFrame, maxShingleDf: Int): DataFrame = {
    val postings = hashedShingles(docs)
      .groupBy("hb")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxShingleDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = postings
      .select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = postings
      .filter(size(col("ids")) >= 2)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
  }

  /** Overlap-coefficient threshold for [[dedupContainment]]. */
  val ContainmentThreshold = 0.8

  /** dedup_containment — ASYMMETRIC near-dup detection by overlap
    * coefficient |A∩B| / min(|A|,|B|): catches subset duplication (a
    * short doc quoted whole inside a long one; a page re-published with
    * a long footer) that symmetric Jaccard structurally misses — a doc
    * fully contained in one 10× its size has containment 1.0 but
    * Jaccard ≤ 0.1, far below any dedup threshold. This is why
    * production pipelines run a containment pass alongside Jaccard
    * (MinHash cannot estimate containment — its collision probability
    * IS Jaccard — so this rides the exact posting-list pipeline, same
    * one shuffle + df-capped fan-out as dedup_ngram_jaccard).
    * `contained_doc` names the smaller-set side (the one a curation
    * policy would drop). */
  def dedupContainment(s: SparkSession, dir: String,
      threshold: Double = ContainmentThreshold,
      maxShingleDf: Int = MaxShingleDf): DataFrame =
    containmentPairs(Tables.documents(s, dir), threshold, maxShingleDf)

  def containmentPairs(docs: DataFrame, threshold: Double,
      maxShingleDf: Int = MaxShingleDf): DataFrame =
    shinglePairStats(docs, maxShingleDf)
      .withColumn("containment",
        col("common").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        when(col("na") <= col("nb"), col("doc_a"))
          .otherwise(col("doc_b")).as("contained_doc"),
        col("containment"))
      .orderBy("doc_a", "doc_b")

  /** dedup_minhash_verified (rows-only) — the full production dedup shape:
    * MinHash-LSH candidate generation followed by EXACT n-gram Jaccard
    * computed ONLY on the candidate pairs. At 100 TB the exact join runs
    * over |candidates| ≪ n² pairs; this is the composition of #25 and #27
    * as one operator. */
  def dedupMinhashVerified(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, dir)
    // The hashed-shingle frame feeds the size aggregate and both
    // verify-join sides — PERSISTED, since lazy recompute would re-run
    // the scan→shingle→hash pipeline per consumer (measured 7x slower at
    // sf0.1 before caching; Spark ML's MinHashLSH caches its transformed
    // input for the same reason). Signatures come from the native
    // one-pass MinHash32 projection and need no shingle frame at all.
    // Cache contract: the returned plan consumes this frame on three
    // paths, so it stays persisted — callers drop it once the result is
    // consumed (spark.catalog.clearCache(), as Verify/Bench do per query).
    val sh = hashedShingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val cands = minhashCandidatesFrom(minhashSignatures(docs))
      .select("doc_a", "doc_b")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("hb")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("hb")), Seq("doc_b", "hb"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** dedup_minhash_incremental (rows-only) — FUZZY admission control:
    * [[dedupIncremental]]'s ingest shape with near-duplicate semantics.
    * A new batch (doc_id ≥ [[IncrementalSplit]]) is screened against the
    * already-ingested corpus (doc_id < split) and against earlier docs
    * of the same batch; each batch doc gets `dup_of_corpus` /
    * `dup_in_batch` flags and the `keep` admission verdict, where "dup"
    * means exact shingle-Jaccard ≥ threshold verified on MinHash-LSH
    * candidates only.
    *
    * The scale property that matters: the corpus side is NEVER re-paired
    * with itself. Corpus band buckets are a precomputable index the
    * batch probes (batch⋈corpus equi-join on (band, bucket)); in-batch
    * pairs come from the batch's own buckets. Corpus buckets larger than
    * [[MaxBucket]] are boilerplate and skipped, exactly as the
    * full-corpus path does. Verification joins run over |candidates|
    * pairs, so daily-ingest cost is O(batch + touched corpus), not
    * O(corpus²) — the fuzzy analogue of the hash-index anti-join. */
  def dedupMinhashIncremental(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame =
    dedupMinhashIncrementalFrom(Tables.documents(s, dir), IncrementalSplit, threshold)

  /** Admission core on any documents-shaped frame (testable): split into
    * corpus/batch by doc_id, build the corpus index in place, delegate. */
  def dedupMinhashIncrementalFrom(docs: DataFrame, split: Long,
      threshold: Double): DataFrame = {
    val corpus = docs.filter(col("doc_id") < split)
    admissionAgainstIndex(docs.filter(col("doc_id") >= split),
      bandBuckets(minhashSignatures(corpus)), hashedShingles(corpus), threshold)
  }

  /** The admission kernel: batch docs vs a PRECOMPUTED corpus index —
    * `corpusBuckets` (doc_id, band, bucket) and `corpusShingles`
    * (doc_id, hb), exactly what [[bandBuckets]]/[[hashedShingles]] emit.
    * The index is LANDABLE: at scale it lives as parquet the ingest job
    * appends to, so each day's batch probes an index instead of
    * re-shingling the corpus ([[graft.streaming.EventStreams]] lands it
    * per micro-batch). Corpus and batch doc_ids must be disjoint; as
    * defense in depth against an at-least-once replay where a batch doc
    * already made it into the index, self-pairs (b == o) are dropped —
    * a doc can never be a dup of its own index entry. */
  def admissionAgainstIndex(batchDocs: DataFrame, corpusBuckets: DataFrame,
      corpusShingles: DataFrame, threshold: Double): DataFrame = {
    // batch shingles feed the size agg and both verify sides — persisted
    // (the dedup_minhash_verified contract: caller drops via clearCache)
    val batchSh = hashedShingles(batchDocs).persist(StorageLevel.MEMORY_AND_DISK)
    val batchB = bandBuckets(minhashSignatures(batchDocs))
    val bigBuckets = corpusBuckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("n")).filter(col("n") > MaxBucket)
      .select("band", "bucket")
    val candCorpus = batchB.select(col("doc_id").as("b"), col("band"), col("bucket"))
      .join(corpusBuckets.join(bigBuckets, Seq("band", "bucket"), "left_anti")
        .select(col("doc_id").as("o"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("b") =!= col("o"))
      .select("b", "o").distinct()
    // in-batch: (a < b) pairs; the EARLIER doc is the blocker, matching
    // dedupIncremental's first-in-batch-wins convention
    val candBatch = bucketPairs(batchB, Seq("band", "bucket"))
      .select(col("doc_b").as("b"), col("doc_a").as("o"))
      .distinct()
    val cands = candCorpus.withColumn("from_corpus", lit(true))
      .unionByName(candBatch.withColumn("from_corpus", lit(false)))
    // only corpus docs that surfaced as a candidate `o` feed the verify:
    // semi-join the corpus shingles down to that set BEFORE the (o, hb)
    // join and the size agg, so each batch costs O(batch + touched
    // corpus) — not a full-corpus shuffle per micro-batch
    val touched = cands.select(col("o").as("doc_id")).distinct()
    val shO = corpusShingles.join(touched, Seq("doc_id"), "left_semi")
      .unionByName(batchSh)
    val sizes = shO.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = cands
      .join(batchSh.select(col("doc_id").as("b"), col("hb")), Seq("b"))
      .join(shO.select(col("doc_id").as("o"), col("hb")), Seq("o", "hb"))
      .groupBy("b", "o", "from_corpus").agg(count(lit(1)).as("common"))
    val verified = common
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .join(sizes.select(col("doc_id").as("o"), col("n_sh").as("no")), Seq("o"))
      .filter(col("common").cast("double") /
        (col("nb") + col("no") - col("common")) >= threshold)
    val perDoc = verified.groupBy(col("b").as("doc_id"))
      .agg(max(col("from_corpus")).as("dup_of_corpus"),
        max(!col("from_corpus")).as("dup_in_batch"))
    batchDocs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_of_corpus"), lit(false)).as("dup_of_corpus"),
        coalesce(col("dup_in_batch"), lit(false)).as("dup_in_batch"))
      .withColumn("keep", !col("dup_of_corpus") && !col("dup_in_batch"))
      .orderBy("doc_id")
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: every node repeatedly takes the smallest label
    * among itself and its neighbors until a fixpoint. Converges in
    * O(component diameter) rounds — near-dup clusters are shallow (a dup
    * of a dup of X is usually also a direct dup of X), so a handful of
    * rounds suffices; the `maxIter` guard bounds pathological chains.
    *
    * Each round is ONE equi-join + ONE groupBy, both on the node id, and
    * the frame is `localCheckpoint`ed per round — without that, the
    * iterated lineage grows exponentially and the planner re-executes
    * every prior round. The convergence check is a scalar count (never a
    * data collect). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val adj = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // A checkpointed frame carries NO size statistics, so Catalyst would
    // sort-merge-join the ADJACENCY side against it every round (the
    // graph_pagerank lesson, GraphOps.BroadcastNodesMax). Label state is
    // two longs per node — broadcast it below the same bound; past it,
    // fall back to the keyed shuffle join, the right plan once node
    // state outgrows memory.
    val broadcastLabels =
      labels.count() <= graft.operators.GraphOps.BroadcastNodesMax
    def maybeBc(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = adj
        .join(maybeBc(labels.withColumnRenamed("id", "dst")), Seq("dst"))
        .select(col("src").as("id"), col("label"))
      // pointer jump (path halving): also adopt the label OF my label —
      // labels reach fixpoint in O(log diameter) rounds instead of
      // O(diameter), so a long path can never exhaust maxIter
      // the pointer side is the same O(nodes) label state — broadcast it
      // below the shared bound too, or the self-join shuffles AND sorts
      // both sides every round
      val viaParent = labels.as("a")
        .join(maybeBc(
          labels.select(col("id").as("label"), col("label").as("ll")).as("b")),
          Seq("label"))
        .select(col("id"), col("ll").as("label"))
      // provenance-tagged union: the row's OWN previous label rides the
      // same aggregation (max over the single own=true row), so the
      // convergence check is a filter over THIS checkpointed frame — no
      // extra compare join per round
      val next = labels.withColumn("own", lit(true))
        .union(viaNeighbor.withColumn("own", lit(false)))
        .union(viaParent.withColumn("own", lit(false)))
        .groupBy("id").agg(min("label").as("label"),
          max(when(col("own"), col("label"))).as("old"))
        .localCheckpoint()
      val changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select("id", "label")
      converged = changed == 0
      i += 1
    }
    adj.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — a component's " +
        s"diameter exceeds maxIter; raise maxIter (labels would be silently wrong)")
    labels
  }

  /** dedup_clusters — the last stage of production dedup: near-dup pairs
    * → connected components → one cluster id per document (its own id for
    * non-duplicated docs, the cluster-min id otherwise). Downstream keeps
    * exactly the rows where doc_id == cluster_id.
    *
    * Edge source: the EXACT posting-list Jaccard pairs
    * ([[ngramJaccardPairs]], oracle-twinned) — deterministic, so the
    * whole operator (including the ITERATIVE pointer-jumping label
    * propagation) is oracle-checked against a DuckDB `WITH RECURSIVE`
    * min-label closure. At 100 TB the same [[connectedComponents]] call
    * composes with [[dedupMinhashVerified]]'s LSH-verified pair graph
    * instead (the sub-quadratic candidate path); the spec asserts every
    * LSH-verified pair is co-clustered here, pinning the two edge
    * sources to the same cluster structure. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    // persisted: the adjacency union reads this frame twice, and each read
    // would otherwise re-run the whole shingle+posting pipeline
    val pairs = ngramJaccardPairs(Tables.documents(s, dir), 0.5)
      .select("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // connectedComponents materializes eagerly (per-round checkpoints), and
    // the returned labels frame is checkpointed — the pair cache is dead
    // weight after it, so release it instead of leaking a block per call
    val labels = connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    pairs.unpersist()
    Tables.documents(s, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** semantic_clusters — connected components over the EMBEDDING
    * near-dup graph: one canonical cluster id per vector, the semantic
    * twin of [[dedupClusters]] and the grouping SemDeDup-style curation
    * reads when it wants whole duplicate FAMILIES rather than pairwise
    * keep verdicts (transitive closure: A≈B≈C clusters together even
    * when cos(A,C) dips below τ).
    *
    * Pair source: the BUCKETED [[embeddingLshPairs]] (multi-probe
    * hyperplane LSH prefilter, exact cosine only on bucket-collision
    * candidates) — pair volume is bucket-density-bounded, never the
    * all-pairs cross join, so the keyed query survives 100× data. The
    * oracle mirrors the same LSH twin (seeded planes as DuckDB literals)
    * feeding the recursive min-label closure, so the key stays
    * hash-exact. [[semanticClustersBrute]] is the spec-only cartesian
    * baseline: in the dedup operating regime (planted cos≈0.999 twins,
    * τ=0.9) RecallSpec/DedupSpec prove the two compositions produce
    * IDENTICAL clusters; at the organic τ=0.35 similarity-search regime
    * LSH recall is sub-1 by design and the spec instead pins that every
    * LSH edge co-clusters. */
  def semanticClusters(s: SparkSession, dir: String): DataFrame =
    semanticClustersFrom(Tables.embeddings(s, dir))

  /** Frame-parameterized semantic clustering on the bucketed pair source
    * (the production composition: LSH pairs → pointer-jumping CC). */
  def semanticClustersFrom(embs: DataFrame, threshold: Double = 0.35,
      probeBits: Int = 2): DataFrame =
    clustersFromPairs(embs,
      embeddingLshPairs(embs, threshold, probeBits))

  /** Spec-only brute baseline: same CC stage over the exact all-pairs
    * cosine graph. Quadratic — never keyed; exists so specs can assert
    * cluster-equality with [[semanticClustersFrom]] in the planted
    * near-dup regime. */
  def semanticClustersBrute(embs: DataFrame, threshold: Double = 0.35): DataFrame =
    clustersFromPairs(embs, embeddingBrutePairs(embs, threshold))

  private def clustersFromPairs(embs: DataFrame, pairSrc: DataFrame): DataFrame = {
    val pairs = pairSrc
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val labels = connectedComponents(pairs).withColumnRenamed("id", "vec_id")
    pairs.unpersist()
    embs.select(col("vec_id").cast("long").as("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("label"), col("vec_id")).as("cluster_id"))
      .orderBy("vec_id")
  }

  /** dedup_survivors — canonical-representative selection: for every
    * [[dedupClusters]] near-dup cluster, elect the member with the BEST
    * [[TextOps.qualityModelScore]] logit as the survivor (ties → lowest
    * doc_id). Real curation pipelines keep the best-quality copy of a
    * duplicated page, not the lowest-id one — min-id survivorship (the
    * `dedup_*` keep_id convention) is an arbitrary-but-deterministic
    * baseline; this key is the quality-aware policy layered on the SAME
    * cluster structure, so swapping policies never changes what counts
    * as a duplicate. Output is the full per-doc verdict frame (cluster,
    * quality logit, cluster size, survivor flag); `WHERE is_survivor`
    * is the kept corpus.
    *
    * Plan shape: the cluster labels (one CC pass over the bounded pair
    * graph) join the scored scan on doc_id, then one cluster_id-keyed
    * window elects per-cluster winners — clusters are near-dup families
    * (bounded by the df-capped pair generator), so no window partition
    * is corpus-sized. At 100×, both inputs already scale (CC is
    * pointer-jumping, scoring is a pure projection); this adds one
    * doc_id equi-join and one bounded window. */
  def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val cl = dedupClusters(s, dir)
    val q = TextOps.qualityModelScore(s, dir).select("doc_id", "logit_e12")
    val wSize = Window.partitionBy("cluster_id")
    val wBest = Window.partitionBy("cluster_id")
      .orderBy(col("logit_e12").desc, col("doc_id"))
    cl.join(q, "doc_id")
      .withColumn("n_members", count(lit(1)).over(wSize).cast("long"))
      .withColumn("is_survivor", row_number().over(wBest) === 1)
      .select("doc_id", "cluster_id", "logit_e12", "n_members", "is_survivor")
      .orderBy("doc_id")
  }

  /** dedup_report — the cross-space CORPUS HEALTH panel: one row per
    * dedup space with how many documents that space flags as duplicates
    * and the flagged rate — the number a curation review reads first
    * ("how duplicated is this corpus, and in which sense?").
    *
    * Spaces: `exact` (byte-identical, docs − distinct md5), `normalized`
    * (C4-style canonicalize-then-hash), `near_dup_jaccard` (exact 3-gram
    * Jaccard ≥ 0.5 — a doc is flagged when a LOWER-id near-dup exists,
    * the first-wins convention), and `semantic_text` (embedding-space
    * verdicts of [[graft.operators.ClusterOps.semanticDedupText]] —
    * keep=false count). Each leg is the SAME definition its standalone
    * key ships (the oracle wraps those keys' twins as subqueries), so
    * the panel can never drift from the operators it summarizes.
    * All legs collapse to single-row aggregates before the union — the
    * output is 4 rows whatever the corpus size. */
  def dedupReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val exact = docs
      .agg((count(lit(1)) - countDistinct(md5(col("text")))).as("n_flagged"))
      .select(lit("exact").as("space"), col("n_flagged"))
    val normd = docs
      .agg((count(lit(1)) - countDistinct(md5(normalizeText(col("text")))))
        .as("n_flagged"))
      .select(lit("normalized").as("space"), col("n_flagged"))
    val jac = dedupNgramJaccard(s, dir)
      .agg(countDistinct(col("doc_b")).as("n_flagged"))
      .select(lit("near_dup_jaccard").as("space"), col("n_flagged"))
    val sem = ClusterOps.semanticDedupText(s, dir).filter(!col("keep"))
      .agg(count(lit(1)).as("n_flagged"))
      .select(lit("semantic_text").as("space"), col("n_flagged"))
    exact.unionByName(normd).unionByName(jac).unionByName(sem)
      .crossJoin(broadcast(total))
      .select(col("space"), col("n_docs"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_docs").cast("double"))
          .as("flagged_rate"))
      .orderBy("space")
  }

  /** Deterministic exact cosine from scaled-int dot/norms (see DotE12). */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** #28 dedup_embedding — embedding-cosine near-duplicate pairs above a
    * threshold. Brute all-pairs here (correctness baseline, native codegen
    * dot product); [[dedupEmbeddingLsh]] is the bucketed 100 TB path, and
    * a spec asserts it reproduces this output at the operating threshold. */
  def dedupEmbedding(s: SparkSession, dir: String, threshold: Double = 0.35): DataFrame =
    embeddingBrutePairs(Tables.embeddings(s, dir), threshold)

  /** Exact all-pairs cosine pairs on any embeddings-shaped frame —
    * the quadratic correctness baseline behind #28 and the spec-only
    * [[semanticClustersBrute]]. */
  def embeddingBrutePairs(embs: DataFrame, threshold: Double): DataFrame = {
    val e = embs
      .select(col("vec_id"), col("embedding"), normE12(col("embedding")).as("nrm"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosine(dotE12(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
    pairs.filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** dedup_embedding_lsh (rows-only) — the scale path for #28: random-
    * hyperplane LSH buckets prefilter the pair space, exact cosine runs
    * only on candidates. Candidate pairs are vectors whose bucket codes
    * differ in ≤ `probeBits` sign bits (multi-probe: one side also emits
    * its bit-flipped buckets), so pair volume is bucket-density-bounded —
    * never the all-pairs cross join of the baseline. The candidate join
    * carries only (bucket, vec_id); embeddings are re-attached by two
    * equi-joins on vec_id before the exact cosine. */
  def dedupEmbeddingLsh(s: SparkSession, dir: String,
      threshold: Double = 0.35, probeBits: Int = 2): DataFrame =
    embeddingLshPairs(Tables.embeddings(s, dir), threshold, probeBits)

  /** Bucketed near-dup pair computation on any embeddings-shaped frame. */
  def embeddingLshPairs(embs: DataFrame, threshold: Double,
      probeBits: Int = 2): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"),
      normE12(col("embedding")).as("nrm"))
    val base = e.select(col("vec_id"),
      SimilarityOps.lshBucket(col("embedding")).as("bucket"))
    // multi-probe masks (identity + ≤probeBits bit flips); xor is
    // symmetric, so flipping only ONE side of the join already covers
    // pairs whose bucket codes differ in ≤ probeBits sign bits
    val masks = SimilarityOps.probeMasks(probeBits)
    val probed = base.select(col("vec_id"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val cands = base.as("a").join(probed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct() // a pair can meet under several masks
    cands
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(dotE12(col("emb_a"), col("emb_b")),
          col("nrm_a"), col("nrm_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
