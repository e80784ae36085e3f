package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured scaling probe for the as-of join implementations.
  *
  * Grows the events table Nx with DISJOINT user keys (each replica's users
  * are shifted into their own id range, so per-key row counts — and thus
  * per-key work — stay constant while total volume grows Nx). A linear
  * operator should show ~Nx wall growth and exactly Nx output rows; any
  * quadratic term shows up immediately as super-linear output.
  *
  * `runMain graft.ScaleProbe [sfDir] [factor]` — prints one JSON line per
  * (impl, scale) with wall seconds and output rows. Results recorded in
  * SURVEY.md §5.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(16)
    // optional comma-separated probe-label filter (dev iteration: re-probe
    // one operator without paying for the whole sweep)
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.eventsUs(spark, sfDir)
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    def grown(k: Int): DataFrame =
      (0 until k).map(i => ev.withColumn("user_id", col("user_id") + lit(i * maxUser)))
        .reduce(_ unionByName _)

    def clicks(e: DataFrame) = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    def purchases(e: DataFrame) = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"),
        col("event_id").as("p_event"), col("value").as("p_value"))

    def time(label: String, scale: Int, df: => DataFrame): Unit = {
      if (!only.forall(_.contains(label))) return
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = df.count()
      val _ = (System.nanoTime() - t1) // count pass untimed, just for rows
      println(s"""{"probe":"$label","scale":$scale,"wall_sec":${f"$wall%.2f"},"rows":$rows}""")
    }

    val eventProbes = Set("asof_window", "asof_native", "merge_intervals",
      "asof_nearest", "cooccurrence_pairs", "lag_features", "spatial_join")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(eventProbes))) {
      val e = grown(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count() // materialize outside the timings
      val c = clicks(e); val p = purchases(e)
      time("asof_window", k, graft.operators.TemporalOps.asofJoin(
        c, p.withColumnRenamed("p_user", "user_id").withColumnRenamed("p_us", "us"),
        "user_id", "us", "m"))
      time("asof_native", k, graft.operators.TemporalOps.asofJoinNative(
        c, p, "user_id", "p_user", "us", "p_us", Seq("p_event", "p_value")))
      // gaps-and-islands shares the disjoint-key growth: per-user island
      // structure repeats per replica, so rows must grow EXACTLY kx
      time("merge_intervals", k, graft.operators.TemporalOps.mergeIntervalsEvents(e))
      time("asof_nearest", k, graft.operators.TemporalOps.asofNearestEvents(e))
      // disjoint users ⇒ (user, day) contexts grow exactly kx while the
      // event-type vocabulary is fixed: the collapsed self-join must stay
      // linear (pair rows fixed at ≤ C(V,2); n_ab grows kx) — the probe
      // that would expose any row² term instantly
      time("cooccurrence_pairs", k, graft.operators.FeatureOps.cooccurrencePairsFrom(
        e.select(col("user_id"),
          to_date(timestamp_micros(col("us"))).as("d"), col("event_type"))))
      // one keyed window: per-user work constant, wall must track scan size
      time("lag_features", k, graft.operators.FeatureOps.lagFeaturesFrom(e))
      // fixed region set, kx points: the grid equi-join must grow linearly
      // in matched pairs with wall tracking the point scan (a cartesian
      // would grow kx × regions)
      time("spatial_join", k, graft.operators.GeoOps.spatialJoinFrames(
        graft.operators.GeoOps.nationBoxes(spark, sfDir),
        graft.operators.GeoOps.pointsFrom(e)))
      // drops e AND the contexts frame cooccurrencePairsFrom persists
      // internally (its caller-drops contract) — a leaked cache here
      // would pressure every later probe's timings
      spark.catalog.clearCache()
    }

    // ---- z-order: pruning fraction must hold as data AND files grow ----
    // Files scale with data (8 per replica); the probe predicate is a fixed
    // 1/16 slice of ONE replica's user range. If z-order's box geometry
    // holds, touched-file FRACTION shrinks ~1/k (absolute touched count
    // stays ~flat) — that is what stats-based pruning buys at 100 TB.
    val docsBase = Tables.documents(spark, sfDir)
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("zorder_write"))) {
      val e = grown(k).select(col("user_id"), col("us"), col("event_type"))
      val out = java.nio.file.Files.createTempDirectory(s"graft_probe_z$k").toString
      val t0 = System.nanoTime()
      graft.operators.LayoutOps.zorderWrite(e, Seq("user_id", "us"), out, 8 * k)
      val wall = (System.nanoTime() - t0) / 1e9
      val b = graft.operators.LayoutOps
        .fileBounds(spark.read.parquet(out), Seq("user_id")).collect()
      val (lo, hi) = (maxUser / 2, maxUser / 2 + maxUser / 16)
      val touched = b.count(r =>
        r.getAs[Long]("mn_user_id") <= hi && r.getAs[Long]("mx_user_id") >= lo)
      println(s"""{"probe":"zorder_write","scale":$k,"wall_sec":${f"$wall%.2f"},""" +
        s""""files":${b.length},"touched":$touched}""")
      // probes are throwaway landings — reclaim the disk immediately
      // (walk streams hold directory handles; close them)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally walk.close()
    }

    // ---- pack_sequences / decontaminate: linear in corpus size ----
    val maxDoc = docsBase.agg(max("doc_id")).head().getLong(0) + 1
    def grownDocs(k: Int): DataFrame =
      (0 until k).map(i => docsBase.withColumn("doc_id", col("doc_id") + lit(i * maxDoc)))
        .reduce(_ unionByName _)
    val docProbes = Set("pack_sequences", "curation_report", "mix_drift",
      "token_histogram", "rare_token_stats", "decontaminate", "bm25",
      "repeated_spans", "span_scrub", "decontaminate_overlap",
      "contamination_report", "text_familiarity", "dedup_minhash_incremental")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(docProbes))) {
      val d = grownDocs(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      time("pack_sequences", k, graft.operators.CurationOps.packSequencesDocs(d))
      // funnel + drift + histogram: outputs bounded (4 stage rows /
      // source dim / sources × ~20 buckets) whatever the corpus — wall
      // must track the scan and nothing else
      time("curation_report", k, graft.operators.CurationOps.curationReportDocs(d))
      time("mix_drift", k, graft.operators.CurationOps.mixDriftDocs(d))
      time("token_histogram", k, graft.operators.CurationOps.tokenHistogramDocs(d))
      // explode → vocab-bounded broadcast join back → doc agg: rows grow
      // exactly kx (one per doc); replica text is identical so the vocab
      // is FIXED while corpus frequency scales kx — the broadcast side
      // must not grow with the corpus
      time("rare_token_stats", k, graft.operators.TextOps.rareTokenStatsDocs(d))
      // eval set fixed (first replica's src0 docs): broadcast stays constant
      // while the train side grows kx
      time("decontaminate", k, graft.operators.CurationOps.decontaminateDocs(
        d.withColumn("source",
          when(col("doc_id") < maxDoc, col("source")).otherwise(lit("train")))))
      // BM25 output is top-k (fixed rows) — the probe measures that wall
      // stays scan-bound as the corpus grows (stats stay one broadcast row)
      time("bm25", k, graft.operators.RetrievalOps.bm25Docs(d))
      // span-dup panel: replica text is identical, so every gram's doc
      // frequency grows kx but the COLLAPSED (gram,doc) frame — the
      // widest shuffle — grows exactly kx; output rows = docs = kx
      time("repeated_spans", k, graft.operators.TextOps.repeatedSpansDocs(d))
      // scrub: at k>1 every replica doc is a clone, so EVERYTHING is
      // covered — the covered-position explode hits its worst case
      // (positions = words × k) and must still track the scan linearly
      time("span_scrub", k, graft.operators.TextOps.spanScrubDocs(d))
      // fractional decontamination + the eval-side audit: the eval
      // source grows kx with the corpus here (worst case — real eval
      // sets are fixed), so the broadcast side is probed at kx too
      time("decontaminate_overlap", k,
        graft.operators.CurationOps.decontaminateOverlapDocs(d))
      time("contamination_report", k,
        graft.operators.CurationOps.contaminationReportDocs(d))
      // replica text identical ⇒ bigram vocab FIXED while df grows kx:
      // the collapsed df frame must stay vocab-sized (the broadcast-side
      // invariant), rows exactly kx
      time("text_familiarity", k, graft.operators.TextOps.textFamiliarityDocs(d))
      // fuzzy admission, clone-growth worst case: first k/2 replicas are
      // the corpus, rest the batch — every batch doc near-dups its clone
      // in EVERY corpus replica, so candidate volume grows with clone
      // count by construction (output rows stay one per batch doc);
      // the MaxBucket cap is what bounds the blow-up at real scale
      time("dedup_minhash_incremental", k,
        graft.operators.DedupOps.dedupMinhashIncrementalFrom(
          // k=1: split inside the single replica; k>1: first k/2 replicas
          d, if (k == 1) maxDoc / 2 else (k.toLong / 2L) * maxDoc, 0.5))
      d.unpersist()
    }

    // ---- bpe_train: vocabulary-bounded training ----
    // Replicas duplicate TEXT identically, so the distinct-word vocab is
    // FIXED while corpus word counts grow kx: the one freq-table pass
    // tracks the scan, but all training rounds iterate the SAME
    // vocab-sized frame — wall must stay ~flat, and the learned merges
    // must be IDENTICAL (every pair count scales uniformly kx, so each
    // round's argmax cannot change).
    var bpeBaseline: Seq[(Int, String, String)] = null
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("bpe_train"))) {
      val d = grownDocs(k)
      val t0 = System.nanoTime()
      val merges = graft.operators.TokenizerOps.bpeTrain(d, 16)
      val wall = (System.nanoTime() - t0) / 1e9
      val shape = merges.map { case (i, l, r, _) => (i, l, r) }
      if (bpeBaseline == null) bpeBaseline = shape
      println(s"""{"probe":"bpe_train","scale":$k,"wall_sec":${f"$wall%.2f"},""" +
        s""""merges":${merges.length},"stable":${shape == bpeBaseline}}""")
      spark.catalog.clearCache()
    }

    // ---- graph_pagerank: disjoint-subgraph growth ----
    // Each replica shifts order/customer/supplier keys into their own id
    // ranges, so the co-purchase graph becomes k disjoint copies: edges,
    // nodes, and output rows must grow EXACTLY kx, and every iteration's
    // two keyed shuffles carry kx volume — any super-linear wall means a
    // shuffle is amplifying (the 100 TB failure mode for iterative ops)
    val liBase = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val ordBase = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val maxOrd = ordBase.agg(max("o_orderkey")).head().getLong(0) + 1
    val maxCust = ordBase.agg(max("o_custkey")).head().getLong(0) + 1
    val maxSupp = liBase.agg(max("l_suppkey")).head().getLong(0) + 1
    // The whole graph family rides the same disjoint growth: components/
    // LPA/triangle structure repeats per replica, so output rows must grow
    // EXACTLY kx and CC/LPA round counts stay constant (diameter is
    // per-replica). graph_bfs is the exception BY DESIGN: its output is
    // the SOURCE's component only, so rows must stay ~FLAT while the
    // corpus grows kx — BFS cost is component-bounded, not corpus-bounded
    // (only the one-off edge build scans the grown fact).
    val graphProbes = Set("graph_pagerank", "graph_components",
      "graph_triangles", "graph_label_prop", "graph_bfs")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(graphProbes))) {
      val li = (0 until k).map(i => liBase
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrd))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * maxSupp)))
        .reduce(_ unionByName _)
      val ord = (0 until k).map(i => ordBase
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(i * maxCust)))
        .reduce(_ unionByName _)
      time("graph_pagerank", k, graft.operators.GraphOps.graphPagerankFrames(li, ord))
      spark.catalog.clearCache()
      time("graph_components", k, graft.operators.GraphOps.graphComponentsFrames(li, ord))
      spark.catalog.clearCache()
      time("graph_triangles", k, graft.operators.GraphOps.graphTrianglesFrames(li, ord))
      spark.catalog.clearCache()
      time("graph_label_prop", k, graft.operators.GraphOps.graphLabelPropFrames(li, ord))
      spark.catalog.clearCache()
      time("graph_bfs", k, graft.operators.GraphOps.graphBfsFrames(li, ord))
      spark.catalog.clearCache()
    }

    // ---- node2vec_walks: GROWING-HUB star (the cap's adversary) ----
    // Not disjoint replicas: the hub's degree itself grows kx, the one
    // topology where uncapped candidate expansion is quadratic (every
    // walk parked on the hub materializes deg(hub) rows per step →
    // (Lk)² at scale k). With the N2vNbrCap'd adjacency the per-step
    // volume is ≤ walks·cap, so wall and rows must grow ~LINEARLY in k;
    // output rows are exactly walks·(RwSteps+1). Any super-linear wall
    // here means the cap stopped binding.
    if (only.forall(_.contains("node2vec_star"))) {
      val leavesBase = 2000L
      for (k <- Seq(1, 4, factor)) {
        val leaves = spark.range(leavesBase * k)
          .select(lit(1L).as("c"), (col("id") + 10L).as("s"))
        time("node2vec_star", k,
          graft.operators.GraphOps.node2vecWalksOnPairs(leaves))
        spark.catalog.clearCache()
      }
    }

    // ---- walk_refresh: FIXED one-edge delta on a growing corpus ----
    // The incremental-maintenance claim: redo volume is bounded by walks
    // through the delta's endpoints, never by the corpus — so under k×
    // corpus growth (disjoint 2-node components) with the same one-edge
    // delta, the printed redo set must stay CONSTANT while output rows
    // grow exactly k× (the kept side is a pure anti-join scan of the
    // landed corpus; any redo growth means invalidation is leaking).
    if (only.forall(_.contains("walk_refresh"))) {
      val base = 20000L
      for (k <- Seq(1, 4, factor)) {
        val corpus = spark.range(base * k)
          .select((col("id") * 2).as("c"), (col("id") * 2 + 1).as("s"))
        val batch = spark.range(1)
          .select(lit(0L).as("c"), lit(999999999L).as("s"))
        // checkpointed: the timed section is the REFRESH, not the
        // landed corpus's own derivation
        val old = graft.operators.GraphOps.randomWalksOnPairs(corpus)
          .localCheckpoint()
        val redo = graft.operators.GraphOps
          .invalidatedWalkStarts(old, batch).count()
        println(s"""{"probe":"walk_refresh_redo","scale":$k,"redo_starts":$redo}""")
        time("walk_refresh", k,
          graft.operators.GraphOps.refreshWalksIncremental(old, corpus,
            batch, graft.operators.GraphOps.randomWalksOnPairs(_, _)))
        spark.catalog.clearCache()
      }
    }

    // ---- link_prediction: disjoint kNN-graph growth ----
    // The operator's scale claim is about the SCORING side (wedges +
    // partial agg + anti-join are degree-bounded, O(n·K²)); the brute kNN
    // build is the documented ann_cosine_topk-precedent baseline, so the
    // probe grows disjoint replicas of the 1× kNN edge set — candidates
    // and wall must grow EXACTLY kx (structure repeats per replica; any
    // super-linear wall means the wedge join is amplifying)
    if (only.forall(_.contains("link_prediction"))) {
      // localCheckpoint (not persist): the per-k clearCache must not evict
      // the shared 1x edge set and silently re-run the brute build
      val e1 = graft.operators.GraphOps
        .knnEdges(Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))
        .localCheckpoint()
      val maxNode = e1.agg(greatest(max("u"), max("v"))).head().getLong(0) + 1
      for (k <- Seq(1, 4, factor)) {
        val e = (0 until k).map(i => e1
          .withColumn("u", col("u") + lit(i * maxNode))
          .withColumn("v", col("v") + lit(i * maxNode)))
          .reduce(_ unionByName _)
        time("link_prediction", k, graft.operators.GraphOps.linkPredictOnEdges(e))
        spark.catalog.clearCache()
      }
    }

    // ---- ann_ivf: corpus growth with cells following √corpus ----
    // Replicas shift vec_id into disjoint ranges AND jitter each
    // component with a replica-dependent wobble (exact clones would give
    // every query a cos≈1 twin and recall would measure nothing). Recall
    // is measured on the FIRST replica's query subset against a brute
    // top-k over the whole grown corpus — |Q₀|·corpus dots, cheap at any
    // k — so the recall series isolates what matters: does the √corpus
    // cell rule hold the operating point as the corpus grows 16×?
    val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val maxVec = embBase.agg(max("vec_id")).head().getLong(0) + 1
    def grownEmb(k: Int): DataFrame =
      (0 until k).map(i => embBase
        .withColumn("vec_id", col("vec_id") + lit(i * maxVec))
        .withColumn("embedding", transform(col("embedding"),
          (x, j) => (x * (lit(1.0f) + lit(0.05f * i) *
            sin(j.cast("double") + lit(i.toDouble)).cast("float"))).cast("float"))))
        .reduce(_ unionByName _)
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("ann_ivf"))) {
      val e = grownEmb(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e.count()
      val cells = math.max(8, math.round(math.sqrt(n.toDouble)).toInt)
      val ivf = graft.operators.SimilarityOps.annIvfFrom(e, cells = cells, nprobe = 2)
      val t0 = System.nanoTime()
      val ivfRows = ivf.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val q0 = (id: Long) => id < maxVec && id % graft.operators.SimilarityOps.QueryModulus == 0
      val got = ivfRows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .filter(p => q0(p._1)).toSet
      val brute = graft.operators.SimilarityOps.annCosineTopKFrom(e).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .filter(p => q0(p._1)).toSet
      val recall = (got & brute).size.toDouble / brute.size
      println(s"""{"probe":"ann_ivf","scale":$k,"wall_sec":${f"$wall%.2f"},""" +
        s""""rows":${ivfRows.length},"corpus":$n,"cells":$cells,""" +
        s""""recall":${f"$recall%.3f"}}""")
      e.unpersist()
      spark.catalog.clearCache()
    }

    // ---- exact kmeans + SemDeDup under corpus growth ----
    // Same jittered-replica growth as ann_ivf (k fixed: the operator's
    // contract fixes k for the unrolled oracle; production raises k with
    // √corpus, which the per-round costs are independent of anyway:
    // assignment is map-side, the update shuffle is k×dims groups).
    val clusterProbes = Set("embedding_kmeans", "semantic_dedup",
      "semantic_dedup_incremental")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(clusterProbes))) {
      val e = grownEmb(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count() // populate the cache so `time` measures the operator
      time("embedding_kmeans", k, graft.operators.ClusterOps.kmeansAssign(e))
      time("semantic_dedup", k, graft.operators.ClusterOps.semanticDedupFrom(e))
      // corpus = the base replica, batch = everything above it — batch
      // grows with the clone count, the daily-ingest worst case the
      // minhash admission probe also uses. At k=1 there are no clones,
      // so split INSIDE the single replica (the minhash convention):
      // split=maxVec would make the scale-1 batch empty and the timing
      // a degenerate quantizer-training-only baseline.
      time("semantic_dedup_incremental", k,
        graft.operators.ClusterOps.semanticDedupIncrementalFrom(e,
          if (k == 1) maxVec / 2 else maxVec))
      e.unpersist()
      spark.catalog.clearCache()
    }
    // landed-index read path: build ONCE per scale (untimed separately),
    // then time the probe-only search — the production split the keyed
    // ann_index_probe models. Queries grow with the corpus (the joint-
    // growth convention of the ann_ivf_pq probe), so probe wall growing
    // ~k× while build grows ~k× shows the read path adds no extra
    // corpus-proportional term beyond the candidate scan itself.
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("ann_index_probe"))) {
      val e = grownEmb(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      val dir = java.nio.file.Files.createTempDirectory("graft_annidx_sp").toString
      val tb = System.nanoTime()
      graft.operators.AnnIndexOps.buildAnnIndex(e, dir)
      val build = (System.nanoTime() - tb) / 1e9
      val probe = graft.operators.AnnIndexOps.probeAnnIndex(spark, dir, e)
      val t0 = System.nanoTime()
      probe.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = probe.count()
      println(s"""{"probe":"ann_index_probe","scale":$k,"build_sec":${f"$build%.2f"},""" +
        s""""probe_sec":${f"$wall%.2f"},"rows":$rows}""")
      e.unpersist()
      spark.catalog.clearCache()
    }
    // landed TEXT-retrieval index: same build-vs-probe split as
    // ann_index_probe. Growth uses a DISJOINT TOKEN NAMESPACE per
    // replica (the events disjoint-user convention applied to text:
    // replica i suffixes every token with "·i") so per-token df — and
    // with it the kept vocabulary and per-query candidate volume — stay
    // constant per replica while the corpus grows k×. Clone growth would
    // instead multiply every df by k and the cap would excise the ENTIRE
    // vocabulary by 16× (measured: lex_candidates 1494 → 23976 → 0) —
    // that measures cap pathology on degenerate data, not scaling. The
    // two legs are timed separately: the sparse leg must track the
    // (cap-bounded, per-replica-constant) candidate volume ~linearly;
    // the dense leg is the BUCKETED LSH candidate source since r10 —
    // its wall must track bucket-collision volume, not the |Q|·n brute
    // baseline it replaced (r9 measured that baseline at 56.9 s @16×).
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("retrieval_index_probe"))) {
      val d = (0 until k).map { i =>
          if (i == 0) docsBase
          else docsBase.select(
            (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      val dir = java.nio.file.Files.createTempDirectory("graft_retridx_sp").toString
      val tb = System.nanoTime()
      graft.operators.RetrievalIndexOps.buildRetrievalIndex(spark, d, dir)
      val build = (System.nanoTime() - tb) / 1e9
      val sh = spark.read.parquet(s"$dir/postings")
      val cand = sh.filter(graft.operators.SimilarityOps.isQuery(col("doc_id")))
        .select(col("doc_id").as("q_id"), col("tok"))
        .join(sh.select(col("doc_id").as("n_id"), col("tok")), "tok")
        .filter(col("q_id") =!= col("n_id"))
        .select("q_id", "n_id").distinct().count()
      val probe = graft.operators.RetrievalIndexOps.probeRetrievalIndex(spark, dir)
      val t0 = System.nanoTime()
      probe.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = probe.count()
      val legs = graft.operators.RetrievalIndexOps.probeLegs(spark, dir)
      val tl = System.nanoTime()
      legs._2.write.format("noop").mode("overwrite").save()
      val lexSec = (System.nanoTime() - tl) / 1e9
      val td = System.nanoTime()
      legs._1.write.format("noop").mode("overwrite").save()
      val denseSec = (System.nanoTime() - td) / 1e9
      // `planes` is the landed meta/ count — the build sizes it from the
      // corpus (adaptivePlanes, round 11), so this probe's dense_sec now
      // tracks the ADAPTIVE curve (per-bucket occupancy held flat), not
      // the fixed-6 curve whose candidate volume grows linearly
      val (planes, builtDocs) =
        graft.operators.RetrievalIndexOps.readMeta(spark, dir)
      println(s"""{"probe":"retrieval_index_probe","scale":$k,"build_sec":${f"$build%.2f"},""" +
        s""""probe_sec":${f"$wall%.2f"},"lex_sec":${f"$lexSec%.2f"},""" +
        s""""dense_sec":${f"$denseSec%.2f"},"lex_candidates":$cand,"rows":$rows,""" +
        s""""planes":$planes,"built_docs":$builtDocs}""")
      d.unpersist()
      spark.catalog.clearCache()
    }
    // ---- docv IVF: the text-side IVF leg under corpus growth ----
    // The keyed doc_neighbors_ivf pins cells=16 (right for 500 docs);
    // the production rule is cells ≈ √corpus, so the probed fraction
    // nprobe/cells SHRINKS with growth — the property fixed LSH planes
    // lack. Disjoint token namespaces per replica (suffix "·i") keep
    // the hashed-vector geometry per replica comparable while the
    // corpus grows k×. Recall is measured on the FIRST replica's query
    // subset against an inline brute top-k over the whole grown corpus
    // (|Q₀|·n exact integer dots — cheap at probe scale), isolating the
    // question that matters: does the √n cell rule hold the operating
    // point as the corpus grows 16×?
    for (k <- Seq(1, 4, factor) if only.forall(_.contains("docv_ivf"))) {
      val d = (0 until k).map { i =>
          if (i == 0) docsBase
          else docsBase.select(
            (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
      val fv = graft.operators.TextOps.docNeighborVectorsOf(d)
        .select(col("doc_id").as("vec_id"), col("v"), col("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = fv.count()
      val cells = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
      val ivf = graft.operators.TextOps.docNeighborsIvfFrom(fv, 5, cells, 2, 2)
      val t0 = System.nanoTime()
      val ivfRows = ivf.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val q0 = (id: Long) => id < maxDoc &&
        id % graft.operators.SimilarityOps.QueryModulus == 0
      val got = ivfRows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .filter(p => q0(p._1)).toSet
      // inline brute top-5 (exact integer dot + the same tie-break)
      val brute = {
        import org.apache.spark.sql.expressions.Window
        val q = fv.filter(graft.operators.SimilarityOps.isQuery(col("vec_id")))
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
        val dot = aggregate(zip_with(col("qv"), col("v"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)
        val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
        fv.join(broadcast(q), col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            (dot.cast("double") / (sqrt(col("qn").cast("double")) *
              sqrt(col("nrm").cast("double")))).as("cos_sim"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
          .filter(p => q0(p._1)).toSet
      }
      val recall = (got & brute).size.toDouble / brute.size
      println(s"""{"probe":"docv_ivf","scale":$k,"wall_sec":${f"$wall%.2f"},""" +
        s""""rows":${ivfRows.length},"corpus":$n,"cells":$cells,""" +
        s""""recall":${f"$recall%.3f"}}""")
      fv.unpersist()
      spark.catalog.clearCache()
    }
    // MMR at PRODUCTION pool sizes: the keyed mmr_diversify pins
    // PoolK=5/MmrK=3 (the unrolled-oracle convention); this probe runs
    // the SAME runtime code path at PoolK=20/MmrK=10 to pin the
    // |Q|·k² claim when k is serving-sized. Growth uses the disjoint
    // token namespace (per-replica df constant); comparing the k=10
    // wall against the k=3 wall at each scale isolates the
    // diversification stage's k² term from the two retrieval legs.
    // The LSH dense leg at PRODUCTION plane sizing: the keyed
    // doc_neighbors_lsh pins 6 planes (64 buckets — right for the test
    // corpus); at fixed planes the candidate volume is (22/64)·|Q|·n —
    // a smaller constant on the same quadratic. The production rule is
    // planes ≈ 6 + log₂(growth), holding per-bucket occupancy constant
    // so candidates per query stay flat. Both variants run the SAME
    // code path (the planes parameter); the seed family is prefix-
    // stable, so growing planes refines existing buckets. Prints the
    // measured candidate-pair volume per variant alongside the walls.
    val lshProbes = Set("dense_lsh_fixed", "dense_lsh_adaptive")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(lshProbes))) {
      val d = (0 until k).map { i =>
          if (i == 0) docsBase
          else docsBase.select(
            (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
      val fv = graft.operators.TextOps.docNeighborVectorsOf(d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fv.count()
      val planes = 6 + (math.log(k.toDouble) / math.log(2.0)).round.toInt
      time("dense_lsh_fixed", k,
        graft.operators.TextOps.docNeighborsLshFromVectors(fv))
      time("dense_lsh_adaptive", k,
        graft.operators.TextOps.docNeighborsLshFromVectors(fv, 5, 2, planes))
      def cands(p: Int): Long = {
        val e = fv.withColumn("bucket",
          graft.operators.TextOps.docLshBucketN(col("v"), p))
        val masks = array(
          graft.operators.SimilarityOps.probeMasks(2, p).map(lit): _*)
        val q = e.filter(col("doc_id") % graft.operators.SimilarityOps.QueryModulus === 0)
          .select(col("doc_id").as("q_id"),
            explode(transform(masks, m => col("bucket").bitwiseXOR(m))).as("bucket"))
        e.join(q, Seq("bucket")).filter(col("q_id") =!= col("doc_id")).count()
      }
      println(s"""{"probe":"dense_lsh_candidates","scale":$k,"planes":$planes,""" +
        s""""cand_fixed6":${cands(6)},"cand_adaptive":${cands(planes)}}""")
      fv.unpersist()
      spark.catalog.clearCache()
    }
    val mmrProbes = Set("mmr_k3_pool5", "mmr_k10_pool20")
    for (k <- Seq(1, 4) if only.forall(_.exists(mmrProbes))) {
      val d = (0 until k).map { i =>
          if (i == 0) docsBase
          else docsBase.select(
            (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      time("mmr_k3_pool5", k, graft.operators.RetrievalOps.mmrDiversifyDocs(d))
      time("mmr_k10_pool20", k,
        graft.operators.RetrievalOps.mmrDiversifyDocs(d, 10, 20))
      d.unpersist()
      spark.catalog.clearCache()
    }
    val pqProbes = Set("embedding_pq", "ann_pq", "ann_ivf_pq")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(pqProbes))) {
      val e = grownEmb(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      time("embedding_pq", k, graft.operators.ClusterOps.embeddingPqFrom(e))
      time("ann_pq", k, graft.operators.ClusterOps.annPqFrom(e))
      // cells follow √corpus (the annIvf sizing rule) so the scanned
      // fraction nprobe/cells SHRINKS as the corpus grows — the claim
      // this probe pins against ann_pq's |Q|·n flat scan above
      val cells = math.max(8, math.round(math.sqrt(e.count().toDouble)).toInt)
      time("ann_ivf_pq", k, graft.operators.ClusterOps.annIvfPqFrom(e, cells = cells))
      e.unpersist()
      spark.catalog.clearCache()
    }

    // SQ8 growth: quantize wall is linear (two scans, one broadcast
    // stats row), and the ADC probe keeps its recall as the corpus and
    // its min/max ranges grow — the training-free compression leg's
    // 100× evidence. Queries grow with the corpus (vec_id % modulus);
    // recall is judged on BASE queries (the ann_ivf convention).
    val sqProbes = Set("embedding_sq8", "ann_sq_topk")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(sqProbes))) {
      val e = grownEmb(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e.count()
      time("embedding_sq8", k, graft.operators.QuantOps.embeddingSq8From(e))
      val t0 = System.nanoTime()
      val sqRows = graft.operators.QuantOps.annSqTopkFrom(e).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val q0 = (id: Long) => id < maxVec &&
        id % graft.operators.SimilarityOps.QueryModulus == 0
      val got = sqRows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .filter(p => q0(p._1)).toSet
      val brute = graft.operators.SimilarityOps.annCosineTopKFrom(e).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .filter(p => q0(p._1)).toSet
      val recall = (got & brute).size.toDouble / brute.size
      println(s"""{"probe":"ann_sq_topk","scale":$k,"wall_sec":${f"$wall%.2f"},""" +
        s""""corpus":$n,"recall":${f"$recall%.3f"}}""")
      e.unpersist()
      spark.catalog.clearCache()
    }

    // MaxSim at growth: fixed 6 planes vs log₂-adaptive planes on the
    // chunk grain (the dense_lsh probe's story applied to late
    // interaction — per-bucket CHUNK occupancy is what the plane count
    // must hold flat). Disjoint token namespace per replica as in the
    // lsh/mmr probes; recall vs the brute MaxSim on BASE queries only
    // (the brute side is |Q₀-chunks|·corpus-chunks — bounded).
    val msProbes = Set("maxsim_lsh_fixed", "maxsim_lsh_adaptive",
      "maxsim_lsh_adaptive_b3", "maxsim_recall")
    for (k <- Seq(1, 4, factor) if only.forall(_.exists(msProbes))) {
      val d = (0 until k).map { i =>
          if (i == 0) docsBase
          else docsBase.select(
            (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
      val cv = graft.operators.TextOps.chunkVectorsOf(d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cv.count()
      val planes = 6 + (math.log(k.toDouble) / math.log(2.0)).round.toInt
      time("maxsim_lsh_fixed", k,
        graft.operators.RetrievalOps.maxsimLshFromChunks(cv))
      time("maxsim_lsh_adaptive", k,
        graft.operators.RetrievalOps.maxsimLshFromChunks(cv, 5, 2, planes))
      // radius grows WITH planes (the dense_lsh lesson: hamming-R of p
      // planes covers a shrinking bucket fraction as p grows, so
      // production tuning moves both together) — the b3 variant shows
      // recall recovering while the candidate volume stays bounded
      time("maxsim_lsh_adaptive_b3", k,
        graft.operators.RetrievalOps.maxsimLshFromChunks(cv, 5, 3, planes))
      val qm = graft.operators.SimilarityOps.QueryModulus
      val basePred = col("doc_id") % qm === 0 && col("doc_id") < maxDoc
      val brute = graft.operators.RetrievalOps.maxsimFromChunks(cv, 5, basePred)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def rec(p: Int, bits: Int): Double = {
        val got = graft.operators.RetrievalOps
          .maxsimLshFromChunks(cv, 5, bits, p, basePred)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & brute).size.toDouble / brute.size
      }
      println(s"""{"probe":"maxsim_recall","scale":$k,"planes":$planes,""" +
        s""""recall_fixed6":${f"${rec(6, 2)}%.3f"},"recall_adaptive":${f"${rec(planes, 2)}%.3f"},""" +
        s""""recall_adaptive_b3":${f"${rec(planes, 3)}%.3f"}}""")
      cv.unpersist()
      spark.catalog.clearCache()
    }

    // ---- connector-fed dedup: generated corpora through MinHash-LSH ----
    // The DSv2 source generates rows in-task (no I/O), so this measures
    // the OPERATOR pipeline itself — native signature expression + banded
    // bucket join — at corpus sizes testdata doesn't reach.
    for (n <- Seq(100000, 1000000) if only.forall(_.contains("synth_minhash_lsh"))) {
      val d = spark.read.format(classOf[graft.sources.SynthDocsSource].getName)
        .option("rows", n).option("partitions", 64).load()
      time("synth_minhash_lsh", n, graft.operators.DedupOps.minhashCandidates(d))
    }
    spark.stop()
  }
}
