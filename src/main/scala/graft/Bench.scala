package graft


/** Benchmark main: times every SparkEntry query at the configured SF and
  * prints one JSON line. Evaluation is forced through the `noop` sink —
  * full expression evaluation of every output column, no count()-induced
  * column pruning. Failures are reported as -1 (never a small positive
  * time). */
object Bench {

  /** Wall-clock budget default, scaled with the surface so it never
    * needs hand re-sizing again (rounds 6, 10 and 12 each burned a run
    * on a fixed constant the surface had outgrown): ~8 s/key covers the
    * measured ≈1.8 s/key warm mean at sf0.1 plus the heavy prefix's
    * build passes, with the 1500 s historical floor kept as a minimum. */
  def defaultBudgetSec(nQueries: Int): Double = math.max(1500.0, 8.0 * nQueries)

  /** Warm-pass replay order: CHEAPEST pass-1 time first. When the budget
    * runs dry mid-pass, the keys left cold are exactly the expensive
    * prefix — where a cold single rep is already within tens of percent
    * of warm — instead of the cheap tail, where a cold rep inflates the
    * recorded number 10–100× (round 12: 185/199 tail keys recorded cold,
    * hybrid_retrieval at 198.5 s vs 1.6 s warm, because warmups ran in
    * heavy-first encounter order and the budget died after 14 keys).
    * Failed keys (t < 0) are excluded — re-running them re-fails. */
  def warmOrder(pass1: Seq[(String, Double)]): Seq[String] =
    pass1.filter(_._2 >= 0).sortBy { case (k, t) => (t, k) }.map(_._1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Dev.session(cpus)
    // Warm the JVM/session (codegen, parquet footer reads) outside the
    // per-query timings.
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      } finally {
        // each call persists its own intermediates (documented contract);
        // timings must not depend on blocks left over from a prior query
        spark.catalog.clearCache()
      }
    }
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET").map(_.toDouble)
      .getOrElse(defaultBudgetSec(SparkEntry.queries.size))
    val wall0 = System.nanoTime()
    def elapsed = (System.nanoTime() - wall0) / 1e9
    // PASS 1 — every key timed exactly once, unconditionally: whatever
    // the box does, each key always gets a recorded number. Heaviest
    // keys run first so the memoized one-off index/store builds land on
    // the keys whose documented contract owns them (the probe-key
    // convention), not on whichever cheap key touches the shared memo
    // first.
    val heavyFirst = Seq("graph_pagerank", "graph_components",
      "graph_components_incremental", "graph_triangles",
      "graph_label_prop", "graph_bfs", "graph_label_probe", "link_prediction",
      "link_prediction_indexed", "graph_ppr", "graph_random_walks", "walk_pmi",
      "node2vec_walks", "node2vec_pmi", "pmi_ann_agreement", "viterbi_segment",
      "ann_ivf_sq", "span_scrub", "dedup_clusters",
      "dedup_survivors", "hybrid_retrieval", "hybrid_retrieval_ivf",
      "mmr_diversify", "maxsim_retrieval", "retrieval_index_probe",
      "retrieval_index_probe_admitted", "retrieval_index_probe_compacted",
      "retrieval_index_stats", "retrieval_index_probe_maxsim", "doc_neighbors_ivf",
      "ann_index_probe_compacted", "bigram_lm_score",
      "bpe_tokens", "bpe_merges", "wordpiece_tokens", "optimal_segment", "pack_sequences_bpe", "bpe_fertility", "embedding_kmeans", "semantic_dedup",
      "semantic_dedup_incremental", "semantic_clusters", "semantic_dedup_text", "dedup_report",
      "embedding_pq", "ann_pq", "ann_ivf_pq",
      "repeated_spans", "steam_pipeline", "zorder_layout", "dedup_minhash_verified",
      "dedup_minhash_incremental", "quantile_sketch", "text_tfidf", "bm25_topk",
      "dedup_ngram_jaccard")
    // dev-only comma-separated key filter (degradation-order tests, quick
    // pins); the driver sets no filter and times the full surface
    val onlyB = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val order = (heavyFirst.filter(SparkEntry.queries.contains) ++
      SparkEntry.queries.keys.toSeq.filterNot(heavyFirst.contains).sorted)
      .filter(k => onlyB.forall(_.contains(k)))
    val pass1 = order.map { name => (name, once(name, SparkEntry.queries(name))) }
    // PASSES 2–3 — warm re-reps, cheapest-first (see warmOrder), each
    // rep gated on the remaining wall budget; the recorded number is the
    // min over every rep a key got. Pass 1 already paid per-key codegen
    // and JIT, so a pass-2 rep IS a warm measurement (the old untimed
    // warmup's role), and pass 3 restores the min-of-2-warm protocol for
    // every key the budget still covers.
    val best = scala.collection.mutable.Map(pass1: _*)
    val warmed = scala.collection.mutable.Set.empty[String]
    val replay = warmOrder(pass1)
    var pass = 2
    while (pass <= 3 && elapsed <= budgetSec) {
      replay.iterator.takeWhile(_ => elapsed <= budgetSec).foreach { name =>
        val t = once(name, SparkEntry.queries(name))
        if (t >= 0 && t < best(name)) best(name) = t
        if (t >= 0) warmed += name
      }
      pass += 1
    }
    val results = pass1.map { case (name, _) =>
      (name, best(name), warmed.contains(name)) }
    val qs = results.sortBy(_._1).map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    // names whose recorded number is a cold-start single rep (no warm
    // re-rep fit the budget) — empty on a healthy run; consumers must
    // treat these as upper bounds, not steady-state. By construction
    // (cheapest-first replay) any non-empty cold set is a suffix of the
    // pass-1 cost ranking: the expensive keys, never the cheap tail.
    val cold = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold":$cold,"sf":"$sfDir"}"""
    println(fullLine)
    // The full line above is ~8 kB at the current ~200-key surface — longer
    // than a log-tail capture window, so a consumer that only keeps the
    // last few kB of stdout sees a truncated JSON fragment (observed two
    // rounds running: BENCH parse came back null). Two mitigations:
    // (1) the full line is also written to a file (SPARK_GRAFT_BENCH_OUT,
    //     default bench_full.json in cwd) for artifact landing;
    // (2) the LAST stdout line is a compact summary — same metric/value/
    //     failed/cold/sf plus only the top-20 slowest queries at 3 decimals
    //     — small enough (<1.5 kB) to survive any tail window intact.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: ${e.getMessage}") }
    val top = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
      .map { case (k, v, _) => "\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)},"unit":"sec","queries":$top,"failed":$failed,"cold":$cold,"sf":"$sfDir","note":"top-20 slowest; full per-query map in $outPath and the first metric line"}""")
    spark.stop()
  }
}
