package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{MisraGries, TextHashFunctions}
import graft.functions.TextHashFunctions.rollingHash64

/** Text-analysis operators over the documents table, SURVEY.md §2 #31–34.
  * All single-scan, no shuffle at all (pure per-row projections) — the
  * shape that matters most at 100 TB, where these run as map-side stages
  * fused into the ingest scan by whole-stage codegen.
  */
object TextOps {

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "los"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "en", "que", "une", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"))

  val Langs: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  /** Count of tokens present in a stopword list (occurrences, not distinct),
    * as a codegen'd lambda filter — no explode, no shuffle. */
  def stopHits(words: Column, lang: String): Column =
    size(filter(words, w => w.isInCollection(Stopwords(lang)))).cast("long")

  /** Language argmax over per-language score columns, fixed tie-break
    * order (en > es > de > fr > zh) — ONE definition shared by
    * text_langid and the curation pipeline. */
  def predFromScores(sc: String => Column): Column =
    when(sc("en") >= sc("es") && sc("en") >= sc("de") &&
        sc("en") >= sc("fr") && sc("en") >= sc("zh"), "en")
      .when(sc("es") >= sc("de") && sc("es") >= sc("fr") &&
        sc("es") >= sc("zh"), "es")
      .when(sc("de") >= sc("fr") && sc("de") >= sc("zh"), "de")
      .when(sc("fr") >= sc("zh"), "fr")
      .otherwise("zh")

  /** Predicted language of a text column as a pure expression. */
  def predLangExpr(text: Column): Column = {
    val words = split(text, " ")
    predFromScores(l => stopHits(words, l))
  }

  /** Quality score of a text column as a pure expression (same formula
    * as text_quality: stopword ratio, punctuation ratio, length). */
  def qualityExpr(text: Column): Column = {
    val words = split(text, " ")
    val punctRatio = (length(text) -
      length(regexp_replace(text, "[.,;:!?]", ""))).cast("long").cast("double") /
      length(text).cast("long")
    val stopRatio = stopHits(words, "en").cast("double") / size(words).cast("long")
    stopRatio * lit(0.5) + (lit(1.0) - punctRatio) * lit(0.3) +
      least(size(words).cast("long"), lit(100L)) / lit(100.0) * lit(0.2)
  }

  /** #31 text_langid — stopword-hit scoring per language; argmax with a
    * fixed tie-break order (en > es > de > fr > zh). */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val scored = Tables.documents(s, dir).select(
      col("doc_id") +: Langs.map(l => stopHits(words, l).as(s"s_$l")): _*)
    scored.withColumn("pred_lang", predFromScores(l => col(s"s_$l"))).orderBy("doc_id")
  }

  /** #32 text_quality — length / punctuation / stopword-ratio scoring with
    * a keep flag. All ratios are exact-integer divisions → deterministic
    * doubles for the oracle. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val charsN = length(col("text")).cast("long")
    val wordsN = size(words).cast("long")
    val punctN = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long")
    val stopN = stopHits(words, "en")
    val base = Tables.documents(s, dir).select(col("doc_id"),
      charsN.as("chars_n"), wordsN.as("words_n"),
      punctN.as("punct_n"), stopN.as("stop_n"))
    val punctRatio = col("punct_n").cast("double") / col("chars_n")
    val stopRatio = col("stop_n").cast("double") / col("words_n")
    val quality = stopRatio * lit(0.5) + (lit(1.0) - punctRatio) * lit(0.3) +
      least(col("words_n"), lit(100L)) / lit(100.0) * lit(0.2)
    base.select(col("doc_id"), col("chars_n"), col("words_n"),
        punctRatio.as("punct_ratio"), stopRatio.as("stop_ratio"),
        quality.as("quality"), (quality >= lit(0.5)).as("keep"))
      .orderBy("doc_id")
  }

  // --- model-based quality filter (the classifier-filtering stage) ---
  // Frozen e6-integer weights of a linear quality head (offline-trained
  // artifact, applied at inference time like any production quality
  // classifier — DCLM / FineWeb-Edu ship exactly this shape: a fixed
  // model scoring every document in one pass).
  val QmWStop = 3000000L   // +3.0 × stopword ratio
  val QmWPunct = -4000000L // −4.0 × punctuation ratio
  val QmWAlpha = 1500000L  // +1.5 × alphabetic-word ratio
  val QmWLen = 1000000L    // +1.0 × capped length score
  // boundary calibrated on the sf0.001 corpus to keep ~57% (a filter
  // that kept 0.2% or 99% would exercise nothing); the e12 logit spread
  // there is [−0.98e12, +0.04e12] before the bias
  val QmBiasE12 = -1800000000000L
  val QmLenCap = 500L

  /** quality_model_score — model-based quality filtering: a frozen
    * LINEAR quality head scored over exact-integer document features
    * (stopword / punctuation / alphabetic-word ratios + a capped length
    * score, each quantized to e6). The decision value is the raw logit
    * in e12 integer units — Σ w_e6 · x_e6 with no division or sigmoid
    * (monotone, so keep = logit > 0 is the same decision boundary) —
    * which keeps every row bit-deterministic and fully oracle-checkable
    * where a float dot product + exp would not be. This is the shape of
    * the "train a small classifier, score the whole corpus" curation
    * stage (fastText-style heads in C4/DCLM/FineWeb-Edu): training is
    * out-of-band, scoring is ONE codegen'd projection over the scan —
    * zero shuffles, zero joins, linear in corpus bytes at 100 TB. */
  def qualityModelScore(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val wordsN = size(words).cast("long") // split("") = [""] → always ≥ 1
    val charsN = greatest(length(col("text")).cast("long"), lit(1L))
    val punctN = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long")
    val stopN = stopHits(words, "en")
    val alphaN = size(filter(words, x => x.rlike("[A-Za-z]"))).cast("long")
    // e6 ratio = floor of one correctly-rounded double quotient of two
    // exact integers — the oracle mirrors the formula verbatim
    def e6ratio(n: Column, d: Column): Column =
      floor((n * lit(1000000L)).cast("double") / d).cast("long")
    val base = Tables.documents(s, dir).select(col("doc_id"),
      e6ratio(stopN, wordsN).as("stop_e6"),
      e6ratio(punctN, charsN).as("punct_e6"),
      e6ratio(alphaN, wordsN).as("alpha_e6"),
      (least(wordsN, lit(QmLenCap)) * lit(2000L)).as("len_e6"))
    val logit = lit(QmBiasE12) + col("stop_e6") * lit(QmWStop) +
      col("punct_e6") * lit(QmWPunct) + col("alpha_e6") * lit(QmWAlpha) +
      col("len_e6") * lit(QmWLen)
    base.select(col("doc_id"), col("stop_e6"), col("punct_e6"),
        col("alpha_e6"), col("len_e6"), logit.as("logit_e12"),
        (logit > 0L).as("keep"))
      .orderBy("doc_id")
  }

  val BpeishRegex = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** #33 text_tokens — whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single symbols), chars-per-token. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeishRegex), lit(0))).cast("long").as("re_tokens"),
        (length(col("text")).cast("double") /
          size(regexp_extract_all(col("text"), lit(BpeishRegex), lit(0))).cast("long"))
          .as("chars_per_token"))
      .orderBy("doc_id")

  /** Output dimensionality of [[docEmbed]] — low so the unrolled
    * conditional-sum aggregation and the oracle stay readable; real
    * deployments raise it (256–4096) with zero plan-shape change.
    *
    * ORACLE CONSTRAINT: with the current twin, this must stay a power
    * of two ≤ 16. The oracle buckets dims via unsigned HUGEINT
    * `xh % EmbedDims` while Spark uses signed pmod — equal only when
    * EmbedDims is a power of two (a bitmask either way); and the ±1
    * sign is hard-coded as XXH64 bit 4 on BOTH sides, disjoint from
    * the dim bits only while dims ≤ 16. Raising dims past 16 requires
    * moving the sign bit (and the mod convention) in docEmbed AND the
    * doc_embed/doc_neighbors oracle twins together. */
  val EmbedDims = 16
  require(EmbedDims <= 16 && (EmbedDims & (EmbedDims - 1)) == 0,
    "doc_embed oracle: dims must be a power of two ≤ 16 (sign=bit4, unsigned-vs-pmod mod)")

  /** doc_embed — deterministic document embeddings by SIGNED FEATURE
    * HASHING (Weinberger et al. 2009, the "hashing trick"): every token
    * hashes to a dimension (low 4 bits of XXH64) and a ±1 sign (bit 4 —
    * disjoint from the dim bits), and the document's vector is the
    * per-dimension signed count. The engine-side stand-in for the
    * neural-encoder embedding step: unlike model inference it is a pure
    * function of the text, so the corpus→vector bridge (documents →
    * doc_embed → ann/semantic-dedup) is testable end to end and the
    * DuckDB twin reproduces every component bit-exactly through the
    * XXH64 string emulation. Sign balancing makes collisions cancel in
    * expectation (the property that keeps hashed inner products
    * unbiased). Plan: explode → ONE doc_id-keyed partial-agg shuffle
    * (map-side combine collapses each doc's tokens before the exchange,
    * so shuffle bytes ≈ docs × dims longs, not tokens); output unrolled
    * f0..f15 (the mm_features all-scalar convention). */
  def docEmbed(s: SparkSession, dir: String): DataFrame =
    docEmbedCore(s, dir).orderBy("doc_id")

  /** The unsorted embedding frame — shared by [[docEmbed]] and
    * [[docNeighbors]]. */
  private def docEmbedCore(s: SparkSession, dir: String): DataFrame =
    docEmbedCoreOf(Tables.documents(s, dir))

  private[operators] def docEmbedCoreOf(docs: DataFrame): DataFrame = {
    val h = xxhash64(col("tok"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), pmod(h, lit(EmbedDims.toLong)).as("dim"),
        // bit 4 of the UNSIGNED hash: >>> matches the oracle's
        // HUGEINT floor-div where a signed `div` would not
        when(shiftrightunsigned(h, 4) % 2 === 0, 1L).otherwise(-1L).as("sg"))
    val agg = (0 until EmbedDims).map(i =>
      coalesce(sum(when(col("dim") === i.toLong, col("sg"))), lit(0L)).as(s"f$i"))
    tok.groupBy("doc_id").agg(agg.head, agg.tail: _*)
  }

  /** The hashed doc vectors as dense integer arrays with their squared
    * norm — the documents→vectors bridge frame consumed by
    * [[ClusterOps.semanticDedupText]]. Zero-norm docs (all signs
    * cancelled) are excluded: cosine against them is undefined (the
    * docNeighbors convention). */
  private[operators] def docEmbedVectors(s: SparkSession, dir: String): DataFrame = {
    val nrm = (0 until EmbedDims).map(i => col(s"f$i") * col(s"f$i")).reduce(_ + _)
    docEmbedCore(s, dir)
      .select(col("doc_id").cast("long").as("vec_id"),
        array((0 until EmbedDims).map(i => col(s"f$i")): _*).as("v"),
        nrm.as("nrm"))
      .filter(col("nrm") > 0L)
  }

  /** doc_neighbors — top-k most similar DOCUMENTS by cosine over the
    * [[docEmbed]] hashed vectors: the documents→vectors→search loop
    * closed entirely in exact integer arithmetic (integer dot products
    * and squared norms; the only doubles are the final cos ratio, one
    * mirrored op sequence). The float-free twin of ann_cosine_topk on
    * the documents table — retrieval-by-content with no external
    * embedding table, and a brute-force baseline whose scale path is
    * the same LSH/IVF/PQ bucketing the embedding family ships (hashed
    * vectors are just integer embeddings). Query subset: doc_id %
    * QueryModulus == 0 (the SimilarityOps convention). Zero-norm
    * vectors (all signs cancelled) are excluded on both sides — a
    * cosine against them is undefined. */
  def docNeighbors(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    docNeighborsFromVectors(docNeighborVectors(s, dir), k)

  /** The (doc_id, v, nrm) hashed-vector frame [[docNeighbors]] searches
    * — also the `vectors/` artifact [[RetrievalIndexOps]] lands, so the
    * landed probe is bit-identical to the inline key. */
  private[operators] def docNeighborVectors(s: SparkSession, dir: String): DataFrame =
    docNeighborVectorsOf(Tables.documents(s, dir))

  private[graft] def docNeighborVectorsOf(docs: DataFrame): DataFrame = {
    val v = array((0 until EmbedDims).map(i => col(s"f$i")): _*)
    docEmbedCoreOf(docs)
      .select(col("doc_id"), v.as("v"))
      .withColumn("nrm", aggregate(col("v"), lit(0L), (a, x) => a + x * x))
      .filter(col("nrm") > 0L)
  }

  /** Dense-leg core on any (doc_id, v, nrm) frame (inline or landed). */
  private[operators] def docNeighborsFromVectors(withN: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = withN
      .select(col("doc_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("q_id") % SimilarityOps.QueryModulus === 0)
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    withN.join(broadcast(q), col("q_id") =!= col("doc_id"))
      .select(col("q_id"), col("doc_id").as("n_id"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_id", "rnk")
  }

  /** Hyperplane count for the hashed-vector LSH family (docs + chunks):
    * 6 planes → 64 buckets — the [[SimilarityOps.NumPlanes]] sizing
    * argument applied to the documents corpus (500–5000 docs at the test
    * SFs keeps ~8–80 vectors per bucket). At cluster scale planes grow
    * with log₂(corpus / target bucket size); multi-probe is the recall
    * lever either way. */
  val DocPlanes = 6

  /** Target per-bucket occupancy for the LANDED index's adaptive plane
    * sizing ([[adaptivePlanes]]): 2^planes buckets sized to hold ~this
    * many vectors each. 128 keeps every test corpus (500–5000 docs) at
    * the keyed [[DocPlanes]] = 6 — so the landed probe stays
    * bit-identical to the inline fused keys — while a 10⁹-doc corpus
    * sizes to ~23 planes (~8M buckets, ~120 docs each) instead of
    * 6 planes' ~10⁷ docs per bucket, which would degrade the probe's
    * candidate join toward a corpus scan. */
  val DocBucketTarget = 128L

  /** Production plane count for a corpus of `n` vectors: the smallest p
    * with [[DocBucketTarget]]·2^p ≥ n (exact integer ceil-log₂ — no
    * floating point near the boundary), floored at the keyed
    * [[DocPlanes]]. The [[docPlaneWeightsN]] seed family is
    * PREFIX-stable, so a rebuild at a grown plane count refines the old
    * buckets (each added plane splits every bucket in two) rather than
    * reshuffling them. */
  def adaptivePlanes(n: Long): Int = {
    var p = 0
    while ((DocBucketTarget << p) < n && p < 48) p += 1
    math.max(DocPlanes, p)
  }

  /** Multi-probe radius for the hashed-vector LSH family: all buckets
    * within hamming-2 of the query's (1 + 6 + 15 = 22 of 64 masks) —
    * the recall lever shared by every doc/chunk LSH key and the landed
    * index probe. */
  val DocProbeBits = 2

  /** Deterministic ±1 plane weights over the [[EmbedDims]] INTEGER dims —
    * an independent seed family from [[SimilarityOps.planeWeights]] (the
    * 64-dim float-embedding planes), so the two LSH spaces stay
    * uncorrelated. Per-plane seeds, so `docPlaneWeightsN(p)` for any p
    * is a PREFIX-stable family: growing the plane count refines the
    * existing buckets instead of reshuffling them (each doubling splits
    * every bucket in two — the re-bucketing story for a growing corpus).
    * Package-visible: OracleSql inlines the same values as DuckDB list
    * literals, making every bucket twin bit-exact. */
  private[graft] def docPlaneWeightsN(planes: Int): IndexedSeq[Array[Long]] =
    (0 until planes).map { p =>
      val rng = new scala.util.Random(271L * (p + 3))
      Array.fill(EmbedDims)(if (rng.nextBoolean()) 1L else -1L)
    }

  private[graft] def docPlaneWeights: IndexedSeq[Array[Long]] =
    docPlaneWeightsN(DocPlanes)

  /** LSH bucket id of a hashed integer vector: bit p = sign of the EXACT
    * integer dot product with plane p. Pure codegen arithmetic
    * (planes × EmbedDims long multiply-adds against literal weights —
    * no per-row weight materialization, no doubles, so the DuckDB twin
    * reproduces every bit). */
  private[graft] def docLshBucketN(v: Column, planes: Int): Column =
    docPlaneWeightsN(planes).zipWithIndex.map { case (w, p) =>
      val dot = (0 until EmbedDims).map(i =>
        element_at(v, i + 1) * lit(w(i))).reduce(_ + _)
      when(dot > lit(0L), lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private[graft] def docLshBucket(v: Column): Column =
    docLshBucketN(v, DocPlanes)

  /** doc_neighbors_lsh — the BUCKETED twin of [[docNeighbors]] (the
    * dedup_embedding → dedup_embedding_lsh pattern applied to the hashed
    * doc vectors): multi-probe hyperplane LSH candidate generation, exact
    * integer cosine only on bucket collisions, per-query top-k window
    * unchanged. Candidate volume is (probed buckets / 2^planes) · corpus
    * instead of the brute |Q| · corpus — the dense-retrieval leg that
    * survives 100× data, and the leg `hybrid_retrieval` /
    * `mmr_diversify` / the landed text index actually compose. Fully
    * oracle-checked: buckets, masks, and cosines are pure integer
    * functions of (text, planes), so the DuckDB twin mirrors the whole
    * pipeline bit-for-bit (approximate vs BRUTE by design — recall is
    * RecallSpec's business, algorithm parity is the oracle's). */
  def docNeighborsLsh(s: SparkSession, dir: String, k: Int = 5,
      probeBits: Int = 2): DataFrame =
    docNeighborsLshFromVectors(docNeighborVectors(s, dir), k, probeBits)

  /** Bucketed dense-leg core on any (doc_id, v, nrm) frame — buckets
    * computed inline (a pure function of v, so the landed-bucket and
    * inline compositions are bit-identical). `planes` defaults to the
    * keyed [[DocPlanes]]; ScaleProbe grows it with log₂(corpus) (the
    * production sizing rule) through the same code path. */
  private[graft] def docNeighborsLshFromVectors(withN: DataFrame,
      k: Int = 5, probeBits: Int = 2, planes: Int = DocPlanes): DataFrame =
    docNeighborsLshCore(
      withN.withColumn("bucket", docLshBucketN(col("v"), planes)),
      k, probeBits, planes)

  /** Core over a pre-bucketed (doc_id, v, nrm, bucket) frame — inline or
    * the landed `vectors/` ⋈ `buckets/` artifacts. The bucket equi-join
    * is the shuffle key; each (query, candidate) pair meets exactly once
    * (a corpus vector has ONE bucket; a query's probed buckets are
    * distinct), so no dedup stage is needed. */
  private[operators] def docNeighborsLshCore(e: DataFrame, k: Int,
      probeBits: Int, planes: Int = DocPlanes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = array(
      SimilarityOps.probeMasks(probeBits, planes).map(lit): _*)
    val q = e.filter(col("doc_id") % SimilarityOps.QueryModulus === 0)
      .select(col("doc_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("doc_id"))
      .select(col("q_id"), col("doc_id").as("n_id"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_id", "rnk")
  }

  /** IVF sizing for the hashed-doc-vector family: 16 coarse cells, 2
    * Lloyd's rounds, 2 probed cells — the [[SimilarityOps.annIvf]]
    * defaults applied to the documents corpus; at scale cells follow
    * √corpus (the shared sizing rule), so the probed fraction
    * nprobe/cells SHRINKS as the corpus grows. */
  val DocIvfCells = 16
  val DocIvfRounds = 2
  val DocIvfNprobe = 2

  /** doc_neighbors_ivf — the IVF-bucketed twin of [[docNeighbors]] (the
    * ann_cosine_topk → ann_ivf pattern applied to the hashed doc
    * vectors, completing the text-side LSH/IVF candidate-source pair):
    * a coarse exact-integer kmeans quantizer over the integer count
    * vectors (the [[graft.operators.ClusterOps.kmeansCentroids]]
    * machinery `semantic_dedup_text` already trains — deterministic
    * init, argmin with total-order tie-break), queries probe their
    * [[DocIvfNprobe]] nearest cells by exact integer L2, exact integer
    * cosine only on probed-cell members, per-query top-k window
    * unchanged. Candidate volume is (nprobe/cells)·corpus per query —
    * and unlike fixed LSH planes the cell count follows √corpus, so
    * the scanned fraction shrinks with growth. Fully oracle-checked:
    * the DuckDB twin unrolls the trainer over the same derived doc
    * vectors (the semantic_dedup_text eOverride pattern) and mirrors
    * probe choice, candidate join, and the cosine double chain
    * bit-for-bit. */
  def docNeighborsIvf(s: SparkSession, dir: String, k: Int = 5,
      cells: Int = DocIvfCells, nprobe: Int = DocIvfNprobe,
      rounds: Int = DocIvfRounds): DataFrame =
    docNeighborsIvfFrom(docEmbedVectors(s, dir), k, cells, nprobe, rounds)

  /** IVF core on any (vec_id, v, nrm) integer-vector frame (testable /
    * probe-able; ScaleProbe grows the corpus and follows cells ≈ √n). */
  private[graft] def docNeighborsIvfFrom(fv0: DataFrame, k: Int = 5,
      cells: Int = DocIvfCells, nprobe: Int = DocIvfNprobe,
      rounds: Int = DocIvfRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: kmeans training reads it per round, then the cell
    // assignment and both sides of the candidate join (callers clear
    // the cache once the result is consumed — the annIvf contract)
    val fv = fv0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = ClusterOps.kmeansCentroids(fv.select("vec_id", "v"),
      cells, rounds).localCheckpoint()
    // map-side cell assignment keeps (v, nrm) — no join back on vec_id
    // (ClusterOps.assignKeep rationale)
    val corpus = ClusterOps.assignKeep(fv, cent)
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster").as("cell"))
    // probe choice: exact integer L2 to each centroid, top-nprobe with
    // the (distance, cell) total-order tie-break the oracle mirrors —
    // map-side (probeCellsKeep), query payload carried through
    val qe = ClusterOps.probeCellsKeep(
        fv.filter(SimilarityOps.isQuery(col("vec_id"))), cent, nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    corpus.join(broadcast(qe), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_id", "rnk")
  }

  /** chunk_neighbors — CHUNK-level retrieval over [[chunkEmbed]]'s
    * hashed vectors: for every query-doc chunk, the top-k most similar
    * chunks of OTHER documents by exact integer cosine — the passage
    * lookup a RAG pipeline serves ([[docNeighbors]] finds similar
    * documents; this finds the similar passage INSIDE them, which is
    * what actually gets stuffed into a context window). Query chunks:
    * doc_id % QueryModulus == 0 (the shared convention); same-doc
    * chunks are excluded (overlapping windows of one doc are trivially
    * similar); zero-norm chunks excluded on both sides. Plan: the
    * chunk-vector frame builds once, the query side broadcasts, per-
    * query top-k via one rank window — the brute baseline whose scale
    * path is the same LSH/IVF/PQ bucketing as every embedding family
    * (hashed chunk vectors are just integer embeddings). */
  def chunkNeighbors(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withN = chunkVectors(s, dir)
    val q = withN
      .select(col("doc_id").as("q_doc"), col("chunk_id").as("q_chunk"),
        col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("q_doc") % SimilarityOps.QueryModulus === 0)
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("q_doc", "q_chunk")
      .orderBy(col("cos_sim").desc, col("n_doc"), col("n_chunk"))
    withN.join(broadcast(q), col("q_doc") =!= col("doc_id"))
      .select(col("q_doc"), col("q_chunk"),
        col("doc_id").as("n_doc"), col("chunk_id").as("n_chunk"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_doc", "q_chunk", "rnk")
  }

  /** The (doc_id, chunk_id, v, nrm) hashed CHUNK vectors [[chunkNeighbors]]
    * and [[chunkNeighborsLsh]] search — zero-norm chunks excluded (cosine
    * undefined), the docNeighborVectors convention at chunk grain. */
  private[operators] def chunkVectors(s: SparkSession, dir: String): DataFrame =
    chunkVectorsOf(Tables.documents(s, dir))

  private[graft] def chunkVectorsOf(docs: DataFrame): DataFrame = {
    val v = array((0 until EmbedDims).map(i => col(s"f$i")): _*)
    chunkEmbedOf(docs)
      .select(col("doc_id"), col("chunk_id"), v.as("v"))
      .withColumn("nrm", aggregate(col("v"), lit(0L), (a, x) => a + x * x))
      .filter(col("nrm") > 0L)
  }

  /** chunk_neighbors_lsh — the BUCKETED twin of [[chunkNeighbors]]: the
    * same [[docLshBucket]] hyperplane family (hashed chunk vectors live
    * in the same integer space as doc vectors), multi-probe candidates,
    * exact integer cosine on collisions only, same-doc chunks excluded.
    * The passage-retrieval leg at 100×: candidate volume is bucket-
    * density-bounded instead of |Q-chunks| · corpus-chunks. Fully
    * oracle-checked (the chunkHashCtes twin + literal planes). */
  def chunkNeighborsLsh(s: SparkSession, dir: String, k: Int = 5,
      probeBits: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = chunkVectors(s, dir).withColumn("bucket", docLshBucket(col("v")))
    val probes = array(
      SimilarityOps.probeMasks(probeBits, DocPlanes).map(lit): _*)
    val q = e.filter(col("doc_id") % SimilarityOps.QueryModulus === 0)
      .select(col("doc_id").as("q_doc"), col("chunk_id").as("q_chunk"),
        col("v").as("qv"), col("nrm").as("qn"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("q_doc", "q_chunk")
      .orderBy(col("cos_sim").desc, col("n_doc"), col("n_chunk"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_doc") =!= col("doc_id"))
      .select(col("q_doc"), col("q_chunk"),
        col("doc_id").as("n_doc"), col("chunk_id").as("n_chunk"),
        (dot.cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("q_doc", "q_chunk", "rnk")
  }

  /** #34 text_fingerprint (rows-only) — 64-bit FNV-1a rolling-hash document
    * fingerprint via the native codegen expression [[graft.functions.RollingHash64]].
    * Wrap-around multiplication is intentional → not ANSI-SQL-expressible,
    * hence rows-only + ScalaTest. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), rollingHash64(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // ---------- heavy hitters (boilerplate token detection) ----------

  /** heavy_hitters — tokens occurring in more than `phi` of all token
    * instances, the boilerplate-detection primitive for corpus cleaning.
    *
    * Two passes, both cheap: (1) one Misra–Gries sketch pass with capacity
    * ⌈1/phi⌉ — by the sketch guarantee its ≤ ⌈1/phi⌉ surviving entries are
    * a SUPERSET of every token with count > n·phi, and the summary is
    * model-metadata-sized on the driver; (2) an exact count pass filtered
    * to those candidates, thresholded against n·phi with n carried as a
    * broadcast single-row aggregate (no driver scalar in the plan). The
    * output is therefore EXACT — same rows as a full groupBy+HAVING — at
    * a fraction of the shuffle (candidates, not the whole vocabulary). */
  def heavyHitters(s: SparkSession, dir: String, phi: Double = 0.01): DataFrame = {
    val k = math.ceil(1.0 / phi).toInt
    val mg = udaf(new MisraGries(k))
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    // ONE eager pass computes both the sketch and the total token count —
    // both are model metadata (≤⌈1/phi⌉ entries + one long on the driver).
    // With the threshold n·phi known up front, the returned frame scans the
    // token pipeline exactly once, so nothing needs persist (the round-2
    // version cached this frame and leaked the block in long sessions).
    val meta = toks.agg(mg(col("tok")).as("sketch"), count(lit(1)).as("n")).head()
    val candidates = meta.getAs[Map[String, Long]]("sketch").keys.toSeq
    val threshold = meta.getAs[Long]("n") * phi
    toks.filter(col("tok").isInCollection(candidates))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") > lit(threshold))
      .select("tok", "c")
      .orderBy("tok")
  }

  /** group_heavy_hitters — heavy tokens PER GROUP (lang): a Misra–Gries
    * sketch pass per group, then an exact verify pass restricted to the
    * per-group candidates. Unlike the global [[heavyHitters]] (whose
    * candidate list is driver-side model metadata), the candidates here
    * stay IN the plan: the sketch maps explode to a (lang, tok)
    * candidate frame that broadcast-joins the verify pass — no driver
    * materialization, so group count can scale to whatever the sketch
    * budget (groups × ⌈1/φ⌉ entries) allows. Output is EXACT per group
    * (superset guarantee per partition-merged sketch), same rows as a
    * per-group HAVING. */
  def groupHeavyHitters(s: SparkSession, dir: String, phi: Double = 0.01): DataFrame = {
    val k = math.ceil(1.0 / phi).toInt
    val mg = udaf(new MisraGries(k))
    val toks = Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val sketches = toks.groupBy("lang")
      .agg(mg(col("tok")).as("sketch"), count(lit(1)).as("n"))
    val candidates = sketches
      .select(col("lang"), col("n"), explode(map_keys(col("sketch"))).as("tok"))
    toks.join(broadcast(candidates), Seq("lang", "tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("c"), first(col("n")).as("n"))
      .filter(col("c") > col("n").cast("double") * lit(phi))
      .select(col("lang"), col("tok"), col("c"))
      .orderBy("lang", "tok")
  }

  // ---------- TF-IDF ----------

  /** text_tfidf — top-3 characteristic terms per document by TF-IDF.
    *
    * Score = tf × (N / df), the raw-ratio idf variant: every input is an
    * exact integer and the double arithmetic (one multiply, one divide,
    * left-associated in both engines) is correctly rounded, so the score
    * is bit-identical to the DuckDB oracle — a transcendental `ln` idf
    * would be a one-line swap but its last-ulp behavior is libm-specific
    * and would break cross-engine hash comparison. Ranking ties break on
    * the term itself, so top-k is deterministic.
    *
    * Shape at scale: explode → two partial-agg groupBys (term frequency
    * per doc, document frequency per term) → equi-join on term → window
    * over the bounded doc_id partition. N rides along as a broadcast
    * single-row aggregate — no driver scalar in the plan. */
  def textTfidf(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(df_, Seq("term"))
      .join(broadcast(n))
      .withColumn("tfidf", col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
      .orderBy("doc_id", "rnk")
  }

  // ---------- PII scrubbing ----------

  /** Conservative PII patterns, valid in BOTH Java regex (Spark) and RE2
    * (DuckDB): no backrefs, no lookaround. Each is replaced by its tag. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}" -> "<PHONE>",
    "[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}" -> "<CARD>")

  /** Scrubbed text as a pure expression: patterns applied in declaration
    * order (card/phone before nothing overlaps email in practice, but the
    * fixed order makes the result well-defined either way). */
  def scrubExpr(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** text_pii_scrub — per-document PII redaction + how much was redacted.
    * The redaction count is measured on the ORIGINAL text (matches per
    * pattern), so input that already contains a literal tag like
    * "&lt;EMAIL&gt;" cannot inflate the count (round-2 advice). Pure
    * per-row projection: fuses into the scan, no shuffle. */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val scrubbed = scrubExpr(col("text"))
    val nTags = PiiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    }.reduce(_ + _)
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(scrubbed).as("scrubbed_md5"),
        nTags.as("n_redactions"),
        (scrubbed =!= col("text")).as("had_pii"))
      .orderBy("doc_id")
  }

  /** #34e ngram_counts — corpus n-gram vocabulary statistics: per-doc
    * bigram explode (multiplicity kept) → ONE partial-agg shuffle
    * counting total occurrences and document frequency → top-N by
    * frequency with a total-order tiebreak. The vocabulary/boilerplate
    * census pass of a training-data pipeline; the distinct-doc count
    * rides the same shuffle as the total. */
  def ngramCounts(s: SparkSession, dir: String, k: Int = 2, topN: Int = 100): DataFrame =
    Tables.documents(s, dir)
      .filter(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"),
        explode(DedupOps.wordGrams(col("text"), k)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("ngram"))
      .limit(topN)

  val WinnowK = 3 // tokens per gram
  val WinnowW = 4 // hashes per winnowing window

  /** #34g text_winnow (*rows-only*: 64-bit xxhash not portable to the
    * oracle) — winnowing fingerprints (the MOSS scheme): k-gram rolling
    * hashes, minimum of each w-hash window, consecutive duplicates
    * collapsed. Guarantee: any shared run of ≥ w+k-1 tokens between two
    * documents shares at least one fingerprint, while only ~2/(w+1) of
    * hashes are kept. Pure projection + explode over [[DedupOps
    * .wordGrams]] — fuses into the scan, zero shuffle. */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    winnowDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def winnowDocs(docs: DataFrame, k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    // hs MUST be materialized as its own projection: inlining it into the
    // window lambda makes Catalyst re-evaluate the whole gram+hash array
    // construction per window index — O(tokens²) string work per doc
    // (measured 25 s vs ~1 s at sf0.1). As a column reference it is built
    // once per row and each window is an O(w) slice.
    val wins = transform(sequence(lit(0), size(col("hs")) - w),
      i => array_min(slice(col("hs"), i + 1, lit(w))))
    docs.filter(size(split(col("text"), " ")) >= k + w - 1)
      .select(col("doc_id"),
        transform(DedupOps.wordGrams(col("text"), k), g => xxhash64(g)).as("hs"))
      .select(col("doc_id"), explode(array_distinct(wins)).as("fp"))
      .orderBy("doc_id", "fp")
  }

  val RepMaxDupBigram = 0.5  // Gopher-style duplicate-bigram gate
  val RepMaxTopWord = 0.1    // max share of any single word

  /** #34h repetition_stats — Gopher-style per-document repetition gates:
    * duplicate-word fraction, duplicate-bigram fraction, and the share of
    * the single most frequent word. Looping generators and boilerplate
    * score high on all three; the keep flag composes the bigram and
    * top-word gates. Everything is computed from arrays materialized ONCE
    * per row (array_distinct / lambda counting — no explode, no shuffle),
    * so at 100 TB this fuses into the ingest scan like the other text
    * filters. Exact-integer counts → one division at the edge keeps the
    * doubles bit-identical to the oracle. */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    repetitionStatsDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame: the five repetition moments
    * come from the native [[graft.functions.WordStats]] expression —
    * ONE O(L) hashed pass per row inside whole-stage codegen, the same
    * CharStats treatment applied to the word/bigram level (the fold twin
    * below sorts the word array and folds an interpreted lambda; see
    * LongDocSpec for the measured gap on 10⁵–10⁶-word documents). */
  def repetitionStatsDocs(docs: DataFrame): DataFrame =
    repetitionFromCounts(docs
      .select(col("doc_id"), graft.functions.WordStats.wordStats(col("text")).as("f"))
      .select(col("doc_id"), col("f.words_n").as("words_n"),
        col("f.uniq_words").as("uniq_words"), col("f.bigrams_n").as("bigrams_n"),
        col("f.uniq_bigrams").as("uniq_bigrams"), col("f.top_word_n").as("top_word_n")))

  /** The `functions._`-only formulation — kept as the independent
    * recompute the native expression is spec-checked against. */
  def repetitionStatsDocsFold(docs: DataFrame): DataFrame = {
    // materialize w and g as columns: referencing an array-BUILDING
    // expression inside the counting lambdas would re-evaluate it per
    // element (the winnowing lesson, SURVEY §5)
    val arrs = docs.select(col("doc_id"),
      split(col("text"), " ").as("w"),
      DedupOps.wordGrams(col("text"), 2).as("g"))
    // top_word_n = longest equal-run in the SORTED word array: one
    // O(L log L) sort + one O(L) run-length fold — never the O(uniq×L)
    // nested count lambda, which is quadratic exactly on the long
    // repetitive documents this gate exists to catch (a 100k-word doc is
    // ~10^10 comparisons under the nested form, ~10^6 here).
    val topWordN = aggregate(
      array_sort(col("w")),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x,
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    repetitionFromCounts(arrs.select(col("doc_id"),
      size(col("w")).cast("long").as("words_n"),
      size(array_distinct(col("w"))).cast("long").as("uniq_words"),
      size(col("g")).cast("long").as("bigrams_n"),
      size(array_distinct(col("g"))).cast("long").as("uniq_bigrams"),
      topWordN.cast("long").as("top_word_n")))
  }

  /** Shared gate formulas over the five exact moments. */
  private def repetitionFromCounts(counts: DataFrame): DataFrame = {
    val dupWord = (col("words_n") - col("uniq_words")).cast("double") / col("words_n")
    val dupBigram = when(col("bigrams_n") > 0,
      (col("bigrams_n") - col("uniq_bigrams")).cast("double") / col("bigrams_n"))
      .otherwise(lit(0.0))
    val topWord = col("top_word_n").cast("double") / col("words_n")
    counts.select(col("doc_id"), col("words_n"), col("uniq_words"),
        col("bigrams_n"), col("top_word_n"),
        dupWord.as("dup_word_frac"), dupBigram.as("dup_bigram_frac"),
        topWord.as("top_word_frac"),
        (dupBigram <= lit(RepMaxDupBigram) && topWord <= lit(RepMaxTopWord))
          .as("keep"))
      .orderBy("doc_id")
  }

  // Gopher rule-set thresholds (Rae et al. 2021, public) for gopherGates
  val GopherMinMeanWord = 3.0
  val GopherMaxMeanWord = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMaxBulletFrac = 0.9
  val GopherMaxEllipsisFrac = 0.3
  val GopherMinAlphaFrac = 0.8

  /** Per-row Gopher composite keep as ONE column expression (shared with
    * curation_report's single-scan funnel; FeatureOpsSpec pins it to the
    * full [[gopherGates]] report so the two formulations cannot drift). */
  def gopherKeepExpr(text: Column): Column = {
    val w = split(text, " ")
    val lines = split(text, "\n")
    val wordsN = size(w).cast("long")
    val cns = length(replace(text, lit(" "), lit(""))).cast("long")
    val hashN = (length(text) - length(replace(text, lit("#"), lit("")))).cast("long")
    val ellN = ((length(text) -
      length(replace(text, lit("..."), lit("")))).cast("long") / lit(3)).cast("long")
    val bulletLines = size(filter(lines, x =>
      substring(x, 1, 2) === "- " || substring(x, 1, 2) === "* ")).cast("long")
    val ellipsisLines = size(filter(lines, x => x.endsWith("..."))).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val meanWord = cns.cast("double") / wordsN
    (meanWord >= GopherMinMeanWord && meanWord <= GopherMaxMeanWord &&
      (hashN + ellN).cast("double") / wordsN < GopherMaxSymbolRatio &&
      bulletLines.cast("double") / size(lines).cast("long") < GopherMaxBulletFrac &&
      ellipsisLines.cast("double") / size(lines).cast("long") < GopherMaxEllipsisFrac &&
      alphaWords.cast("double") / wordsN > GopherMinAlphaFrac)
  }

  /** Per-row repetition composite keep as ONE column expression over the
    * native [[graft.functions.WordStats]] moments (shared with
    * curation_report; spec-pinned to [[repetitionStats]]). */
  def repetitionKeepExpr(text: Column): Column = {
    val f = graft.functions.WordStats.wordStats(text)
    val dupBigram = when(f.getField("bigrams_n") > 0,
      (f.getField("bigrams_n") - f.getField("uniq_bigrams")).cast("double") /
        f.getField("bigrams_n")).otherwise(lit(0.0))
    val topWord = f.getField("top_word_n").cast("double") / f.getField("words_n")
    dupBigram <= RepMaxDupBigram && topWord <= RepMaxTopWord
  }

  /** gopher_gates — the remaining Gopher quality rules beyond
    * text_quality/repetition_stats: mean word length window, #/…
    * symbol-to-word ratio, bullet-started and ellipsis-ended line
    * fractions, fraction of words containing an alphabetic char.
    * Pure per-row projection (string length arithmetic + bounded line/
    * word lambdas), zero shuffles; every ratio is one division of exact
    * integers so the composite keep flag hash-matches the oracle. */
  def gopherGates(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"),
      split(col("text"), " ").as("w"), split(col("text"), "\n").as("lines"))
    val wordsN = size(col("w")).cast("long")
    val charsNoSpace = length(replace(col("text"), lit(" "), lit(""))).cast("long")
    val hashN = (length(col("text")) -
      length(replace(col("text"), lit("#"), lit("")))).cast("long")
    // the removed length is always a multiple of 3 → the division is exact
    val ellipsisN = ((length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))).cast("long") / lit(3))
      .cast("long")
    val bulletLines = size(filter(col("lines"), x =>
      substring(x, 1, 2) === "- " || substring(x, 1, 2) === "* ")).cast("long")
    val ellipsisLines = size(filter(col("lines"), x => x.endsWith("..."))).cast("long")
    // [A-Za-z], not [a-z]: the Gopher rule is "contains an alphabetic
    // character" — an all-caps or acronym-heavy document is legitimate
    val alphaWords = size(filter(col("w"), x => x.rlike("[A-Za-z]"))).cast("long")
    val meanWord = charsNoSpace.cast("double") / wordsN
    val symbolRatio = (hashN + ellipsisN).cast("double") / wordsN
    val bulletFrac = bulletLines.cast("double") / size(col("lines")).cast("long")
    val ellipsisFrac = ellipsisLines.cast("double") / size(col("lines")).cast("long")
    val alphaFrac = alphaWords.cast("double") / wordsN
    base.select(col("doc_id"), wordsN.as("words_n"),
        meanWord.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
        bulletFrac.as("bullet_line_frac"), ellipsisFrac.as("ellipsis_line_frac"),
        alphaFrac.as("alpha_word_frac"),
        (meanWord >= GopherMinMeanWord && meanWord <= GopherMaxMeanWord &&
          symbolRatio < GopherMaxSymbolRatio &&
          bulletFrac < GopherMaxBulletFrac &&
          ellipsisFrac < GopherMaxEllipsisFrac &&
          alphaFrac > GopherMinAlphaFrac).as("keep"))
      .orderBy("doc_id")
  }

  val RareMaxFreq = 2L     // a token is "rare" at corpus frequency <= this
  val RareMaxFrac = 0.2    // OOV-ratio admission gate

  /** rare_token_stats — per-document OOV/rare-word ratio against the
    * corpus's own unigram frequencies: a document whose tokens are mostly
    * corpus-rare is gibberish, a language the model isn't training on, or
    * OCR noise (the same signal perplexity filters extract from a
    * language model, kept EXACT-integer so it oracle-checks — no
    * transcendental whose last ulp differs between libms). Plan: one
    * explode → vocab-keyed partial-agg (frequency table) → BROADCAST
    * join back → doc-keyed partial-agg. The frequency side is
    * vocab-bounded (Heaps' law: ≪ corpus size — ~10⁷ unigrams on a
    * 100 TB web corpus, broadcastable), so the exploded corpus is never
    * shuffled on the power-law `tok` key — without the hint, "the"
    * lands one partition and pages someone at 100×; with it the only
    * token-keyed exchange is the map-side-combined frequency agg. If
    * vocab ever outgrows broadcast, drop the hint and lean on AQE skew
    * join. One division at the edge. */
  def rareTokenStats(s: SparkSession, dir: String): DataFrame =
    rareTokenStatsDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe entry point). */
  def rareTokenStatsDocs(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
    toks.join(broadcast(freq), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("freq") <= RareMaxFreq, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_frac"),
        (col("n_rare").cast("double") / col("n_tokens") <= RareMaxFrac).as("keep"))
      .orderBy("doc_id")
  }

  val ChunkSize = 200
  val ChunkStride = 150

  /** #34f doc_chunk — overlapping fixed-window character chunking (the
    * RAG / context-window prep step): chunk starts at 0, stride, 2·stride
    * … < len; each chunk is substring(start, size), the last one short.
    * Pure per-row explode — fuses into the scan, zero shuffle. */
  def docChunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("start", explode(sequence(lit(0L),
        greatest(length(col("text")).cast("long") - 1, lit(0L)), lit(ChunkStride.toLong))))
      .select(col("doc_id"), (col("start") / ChunkStride).cast("long").as("chunk_id"),
        col("start"),
        col("text").substr(col("start").cast("int") + 1, lit(ChunkSize)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .orderBy("doc_id", "chunk_id")

  /** chunk_embed — hashed embeddings at CHUNK granularity: the
    * [[docChunk]] sliding windows each get the [[docEmbed]] signed
    * feature-hashing treatment (per-token XXH64 → dim = low 4 bits,
    * sign = bit 4, per-dim signed counts) — the retrieval unit a RAG
    * pipeline actually indexes (a whole-doc vector averages away the
    * passage that answers a query; chunk vectors don't). Same exact
    * integer arithmetic as doc_embed, so the composed chunking→hashing
    * twin is fully oracle-checked. Plan: per-row chunk explode → token
    * explode → ONE (doc_id, chunk_id)-keyed partial-agg shuffle; shuffle
    * bytes ≈ chunks × dims longs thanks to map-side combine. */
  def chunkEmbed(s: SparkSession, dir: String): DataFrame =
    chunkEmbedOf(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe drives grown
    * corpora through the same chunk→hash path). */
  private[operators] def chunkEmbedOf(docs: DataFrame): DataFrame = {
    val h = xxhash64(col("tok"))
    val tok = docs
      .withColumn("start", explode(sequence(lit(0L),
        greatest(length(col("text")).cast("long") - 1, lit(0L)), lit(ChunkStride.toLong))))
      .select(col("doc_id"), (col("start") / ChunkStride).cast("long").as("chunk_id"),
        col("text").substr(col("start").cast("int") + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        explode(split(col("chunk"), " ")).as("tok"))
      .select(col("doc_id"), col("chunk_id"),
        pmod(h, lit(EmbedDims.toLong)).as("dim"),
        when(shiftrightunsigned(h, 4) % 2 === 0, 1L).otherwise(-1L).as("sg"))
    val agg = (0 until EmbedDims).map(i =>
      coalesce(sum(when(col("dim") === i.toLong, col("sg"))), lit(0L)).as(s"f$i"))
    tok.groupBy("doc_id", "chunk_id").agg(agg.head, agg.tail: _*)
      .orderBy("doc_id", "chunk_id")
  }

  /** char_diversity — per-document character-distribution quality gate:
    * distinct characters, Gini–Simpson diversity 1 − Σ(c/L)², and the
    * effective alphabet size L²/Σc² (inverse Simpson — the Hill number
    * of order 2). Low diversity ⇔ repeated-character spam / degenerate
    * OCR — the char-level sibling of repetition_stats' token gates.
    *
    * Shannon entropy is deliberately NOT emitted: −Σ p·log p hashes a
    * transcendental whose last ulp differs between libms (the text_tfidf
    * ln-free-idf lesson), while Σc² is an exact integer and both edge
    * divisions have exact operands → bitwise deterministic vs the SQL
    * twin. eff_chars is monotone in Rényi-2 entropy, so it ranks
    * documents identically to an entropy gate.
    *
    * Plan: pure per-row map, ZERO shuffles — chars sort once per doc
    * (O(L log L)) and one run-length fold accumulates Σc² and the run
    * count; never the O(distinct×L) nested-count lambda (the
    * repetition_stats lesson), so a 10⁷-char single-character document
    * costs one sort, not 10¹⁴ comparisons. */
  def charDiversity(s: SparkSession, dir: String): DataFrame =
    charDiversityDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame: moments come from the native
    * [[graft.functions.CharStats]] expression — ONE O(L) pass per row
    * inside whole-stage codegen (the fold twin below is O(L log L) with
    * an interpreted per-char lambda; LongDocSpec measures the gap on a
    * 10⁷-char document). Output formulas (and the oracle) are identical
    * for both. */
  def charDiversityDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.CharStats.charStats(col("text")).as("f"))
      .select(col("doc_id"), col("f.n").as("n"),
        col("f.distinct").as("distinct_chars"),
        (lit(1.0) - col("f.sumsq").cast("double") /
          (col("f.n") * col("f.n")).cast("double")).as("simpson"),
        ((col("f.n") * col("f.n")).cast("double") / col("f.sumsq").cast("double"))
          .as("eff_chars"))
      .orderBy("doc_id")

  /** The `functions._`-only formulation (sorted run-length fold) — kept
    * as the independent recompute the native expression is spec-checked
    * against. */
  def charDiversityDocsFold(docs: DataFrame): DataFrame = {
    val fold = aggregate(
      array_sort(col("ch")),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("sumsq"), lit(0L).as("runs")),
      (acc, x) => {
        val same = acc.getField("prev") <=> x
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("sumsq"))
            .otherwise(acc.getField("sumsq") +
              acc.getField("run") * acc.getField("run")).as("sumsq"),
          when(same, acc.getField("runs"))
            .otherwise(acc.getField("runs") + 1L).as("runs"))
      },
      acc => struct(
        (acc.getField("sumsq") + acc.getField("run") * acc.getField("run"))
          .as("sumsq"),
        acc.getField("runs").as("runs")))
    docs
      .select(col("doc_id"), split(col("text"), "").as("ch"))
      .select(col("doc_id"), size(col("ch")).cast("long").as("n"), fold.as("f"))
      .select(col("doc_id"), col("n"),
        col("f.runs").as("distinct_chars"),
        (lit(1.0) - col("f.sumsq").cast("double") / (col("n") * col("n")).cast("double"))
          .as("simpson"),
        ((col("n") * col("n")).cast("double") / col("f.sumsq").cast("double"))
          .as("eff_chars"))
      .orderBy("doc_id")
  }

  val SpanK = 5          // span width in tokens
  val SpanDupMinDocs = 2 // a span is "duplicated" once this many docs carry it

  /** repeated_spans — per-document SPAN-level duplication panel: the
    * fraction of a document's [[SpanK]]-token windows whose exact text
    * also occurs in ≥ [[SpanDupMinDocs]] documents. Document-level dedup
    * (the `dedup_*` family) misses boilerplate STITCHED INTO otherwise
    * unique pages (headers, license blocks, templated paragraphs) — the
    * substring-duplication signal the training-data dedup literature
    * removes at span granularity. This panel scores it so curation can
    * gate on `dup_frac` the way it gates on repetition_stats.
    *
    * Plan shape: explode to gram occurrences (fuses into the scan), ONE
    * partial-agg shuffle to the (gram, doc) level, one gram-keyed window
    * for the document-frequency count (partition size = docs sharing the
    * gram — boilerplate-bounded, same profile as the LSH bucket caps),
    * then a doc-keyed partial agg. No join against an occurrence-level
    * frame, so the widest shuffle is the collapsed (gram, doc) frame,
    * ≤ one row per distinct span per doc. */
  def repeatedSpans(s: SparkSession, dir: String): DataFrame =
    repeatedSpansDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe / LongDocSpec entry). */
  def repeatedSpansDocs(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gd = documents
      .select(col("doc_id"), explode(DedupOps.wordGrams(col("text"), SpanK)).as("gram"))
      .groupBy("gram", "doc_id").agg(count(lit(1)).as("cnt"))
    val per = gd
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("gram")))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_spans"),
        sum(when(col("n_docs") >= SpanDupMinDocs, col("cnt")).otherwise(0L))
          .as("n_dup_spans"))
    documents.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          coalesce(col("n_dup_spans"), lit(0L)).cast("double") /
            col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** span_scrub — the TRANSFORM counterpart of [[repeatedSpans]]: excise
    * every cross-doc duplicated span from each document and re-emit the
    * cleaned text. A word is removed when ANY duplicated [[SpanK]]-gram
    * (one appearing in ≥ [[SpanDupMinDocs]] docs — the same criterion as
    * the panel) covers its position; survivors re-join in order. This is
    * span-granular dedup: the boilerplate run disappears while the
    * unique prose around it survives, where doc-level dedup would either
    * keep the whole page (missed boilerplate) or drop it (lost prose).
    *
    * Plan shape: gram occurrences carry their start position; the dup
    * gram set is a semi-join against the collapsed (gram, doc) frame's
    * df filter; covered word positions explode only from DUP occurrences
    * (boilerplate-bounded, not corpus-bounded); kept words are a
    * (doc, pos)-keyed anti-join; reassembly is one per-doc aggregation
    * whose sort is bounded by the longest document (the text_tfidf
    * window precedent). Everything shuffles on (doc, pos) or gram keys —
    * linear end to end. */
  def spanScrub(s: SparkSession, dir: String): DataFrame =
    spanScrubDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (ScaleProbe / LongDocSpec entry). */
  def spanScrubDocs(documents: DataFrame): DataFrame = {
    // ONE corpus explode yields BOTH streams the operator needs: each
    // word (at its position) AND the SpanK-gram starting there (null in
    // the K−1 tail) — the round-6 verdict flagged the separate
    // split/posexplode word pass as pure re-work. The split array binds
    // once per row via the one-element-transform trick (wordGrams
    // lesson: a named Column would re-split the text per element,
    // O(L²) on LongDocSpec's 10⁷-char docs). Persisted because the gram
    // side and the word side both consume it; the caller drops it
    // (Bench/Verify clearCache between queries — the repo-wide
    // persist contract).
    val wg = transform(array(split(col("text"), " ")), w =>
      transform(w, (x, i) =>
        struct(x.as("word"),
          when(i <= size(w) - SpanK,
            array_join(slice(w, i + 1, lit(SpanK)), " ")).as("gram"))))
    val exploded = documents
      .select(col("doc_id"), posexplode(element_at(wg, 1)))
      .select(col("doc_id"), col("pos").as("wpos"),
        col("col.word").as("word"), col("col.gram").as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = exploded.filter(col("gram").isNotNull)
      .select(col("doc_id"), col("wpos").as("pos"), col("gram"))
    val dupGrams = g.select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= SpanDupMinDocs)
      .select("gram")
    val covered = g.join(dupGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanK - 1))).as("wpos"))
      .distinct()
    val words = exploded.select("doc_id", "wpos", "word")
    val kept = words.join(covered, Seq("doc_id", "wpos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("wpos"), col("word")))),
          x => x.getField("word")), " ").as("clean_text"))
    documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** text_familiarity — corpus-fluency scoring: each document's DISTINCT
    * word-bigrams weighted by their corpus-wide document frequency. A
    * high average df means the doc is built from phrases the corpus has
    * seen everywhere (fluent, or boilerplate); min_df = 1 means at least
    * one phrase is unique to this doc (novelty — or garbage). The
    * integer-exact cousin of an n-gram LM quality filter: df sums are
    * exact longs with ONE double division at the edge, so the score is
    * deterministic and fully oracle-checkable (a real log-prob LM score
    * sums floats and is not).
    *
    * Scale shape: one bigram explode (distinct per doc at the row level,
    * fused into the scan) persisted for its two consumers; the global df
    * agg collapses to vocabulary size; the score join keys on the bigram
    * (df side collapsed — AQE handles the power-law head), then ONE
    * partial-agg groupBy on doc_id. Linear end to end; nothing
    * all-pairs, nothing corpus² — the rare_token_stats shape one n-gram
    * order up. */
  def textFamiliarity(s: SparkSession, dir: String): DataFrame =
    textFamiliarityDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def textFamiliarityDocs(documents: DataFrame): DataFrame = {
    // two consumers (global df, per-doc score join) — persisted; the
    // caller drops it (Bench/Verify clearCache, the repo-wide contract)
    val bg = documents
      .select(col("doc_id"),
        explode(array_distinct(DedupOps.wordGrams(col("text"), 2))).as("bigram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = bg.groupBy("bigram").agg(count(lit(1)).as("df"))
    val per = bg.join(df, Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("sum_df"),
        min(col("df")).as("min_df"))
    val n = coalesce(col("n_bigrams"), lit(0L))
    documents.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), n.as("n_bigrams"),
        coalesce(col("min_df"), lit(0L)).as("min_df"),
        when(n > 0, col("sum_df").cast("double") / n.cast("double"))
          .otherwise(lit(0.0)).as("avg_df"))
      .orderBy("doc_id")
  }

  /** bigram_lm_score — a corpus-trained bigram LANGUAGE MODEL as a
    * quality filter, the integer-exact analog of CCNet's KenLM
    * perplexity gate (Wenzek et al. 2020: score every document under an
    * n-gram LM, route low-probability text to the discard/review
    * bucket). The "model" is nothing but corpus counts — the MLE
    * conditional p(w₂|w₁) = c(w₁w₂)/c(w₁·) — so training is one counting
    * pass and scoring is one join, and every number is an exact long:
    * each transition's probability lands as ⌊c₁₂·10⁶/c₁⌋ and a doc's
    * score is the MEAN transition probability ⌊Σp_e6/n⌋ (arithmetic
    * mean, not the geometric mean a log-prob perplexity uses — logs are
    * transcendental and would break the bit-exact oracle; the ORDERING
    * both induce on mostly-seen vs mostly-novel text is what the filter
    * consumes). `min_p_e6` flags the single most surprising transition
    * (the value a burst-of-garbage detector thresholds), and docs whose
    * every bigram is unique to them score exactly ⌊10⁶·n⁻¹Σ(1/c₁)⌋-ish
    * low. Prefix counts c(w₁·) count BIGRAM STARTS (so Σ_w₂ p(w₂|w₁) = 1
    * up to flooring — the distribution property the telescoping spec
    * pins), not raw token frequency.
    *
    * Scale shape ([[textFamiliarityDocs]] one conditional deeper): ONE
    * non-distinct bigram explode persisted for two consumers (transition
    * counts, per-doc score join); c₁ derives from the transition-count
    * frame itself (a vocabulary-sized partial agg, no second corpus
    * pass); the score join keys on the bigram string (AQE absorbs the
    * power-law head) and folds per-doc with one partial-agg groupBy.
    * Linear end to end; docs with <2 tokens have no transitions and are
    * excluded (mirrored in the oracle). */
  def bigramLmScore(s: SparkSession, dir: String): DataFrame =
    bigramLmScoreDocs(Tables.documents(s, dir))

  /** Core on any documents-shaped frame (testable). */
  def bigramLmScoreDocs(documents: DataFrame): DataFrame = {
    // NON-distinct grams: an LM counts occurrences, not document sets —
    // the one semantic line separating this from textFamiliarity
    val bg = documents
      .select(col("doc_id"),
        explode(DedupOps.wordGrams(col("text"), 2)).as("bigram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bg.groupBy("bigram").agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    // prefix mass from the transition frame (vocab-sized, not corpus)
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val p = c12.join(c1, "w1")
      .select(col("bigram"), expr(s"(c12 * ${RetrievalOps.RrfScale}) div c1").as("p_e6"))
    bg.join(p, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        expr(s"sum(p_e6) div count(1)").as("lm_e6"),
        min("p_e6").as("min_p_e6"))
      .orderBy("doc_id")
  }
}
