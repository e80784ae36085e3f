package graft


/** Benchmark main: times every SparkEntry query at the configured SF and
  * prints one JSON line. Evaluation is forced through the `noop` sink —
  * full expression evaluation of every output column, no count()-induced
  * column pruning. Failures are reported as -1 (never a small positive
  * time). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Dev.session(cpus)
    // Warm the JVM/session (codegen, parquet footer reads) outside the
    // per-query timings.
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    // Two timed passes per query, keep the min: single runs on a shared
    // box are noisy, and the min is the best estimate of steady-state cost.
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
    // optional second timed passes stop once the wall-clock budget is
    // spent, so a slow box degrades to warmup+single-pass timings instead
    // of risking a harness timeout with no output at all. 1500s covers
    // 173 queries × 3 executions at sf0.1 with headroom (round-6 lesson:
    // 480 exhausted mid-run and recorded 43 cold single-reps; round-10
    // lesson: 900 ran dry at the grown 173-key surface and left 34 cold
    // tail entries — re-size the budget when the surface grows).
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1500").toDouble
    val wall0 = System.nanoTime()
    def elapsed = (System.nanoTime() - wall0) / 1e9
    // Steady-state-heaviest keys run FIRST: if the budget ever runs dry,
    // the degradation lands on the cheap alphabetical tail — where a cold
    // single rep inflates the recorded number by tenths of a second, not
    // tens (round-6: steam_pipeline cold 37.7s vs 2.25s warm).
    val heavyFirst = Seq("graph_pagerank", "graph_components",
      "graph_components_incremental", "graph_triangles",
      "graph_label_prop", "graph_bfs", "graph_label_probe", "link_prediction",
      "link_prediction_indexed", "graph_ppr", "graph_random_walks", "walk_pmi",
      "node2vec_walks", "viterbi_segment",
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
    val order = heavyFirst.filter(SparkEntry.queries.contains) ++
      SparkEntry.queries.keys.toSeq.filterNot(heavyFirst.contains).sorted
    val results = order.map(k => (k, SparkEntry.queries(k))).map { case (name, fn) =>
      // UNTIMED warmup execution per query: the first run pays per-query
      // codegen, JIT and transient box load (measured 3.4s→0.9s rep1→rep2
      // drops), which must never dominate a recorded number. BOTH the
      // warmup and the min-of-2 second rep are budget-gated — on a badly
      // contended box the run degrades to one timed pass per query (the
      // pre-warmup behavior) instead of risking a harness timeout with no
      // JSON line at all; only the single timed rep is unconditional.
      val warmed = elapsed <= budgetSec
      if (warmed) once(name, fn) // warmup result deliberately unused:
      // even a transient warmup failure must not mask the timed rep —
      // the single timed rep really is unconditional
      val a = once(name, fn)
      val b = if (a < 0 || elapsed > budgetSec) a else math.min(a, once(name, fn))
      (name, b, warmed)
    }
    val qs = results.sortBy(_._1).map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    // names whose recorded number is a cold-start single rep (warmup was
    // budget-skipped) — empty on a healthy run; consumers must treat
    // these as upper bounds, not steady-state
    val cold = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold":$cold,"sf":"$sfDir"}"""
    println(fullLine)
    // The full line above is ~8 kB at the current 195-key surface — longer
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
