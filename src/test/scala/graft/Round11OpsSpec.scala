package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RetrievalIndexOps

/** Round 11: compaction's concurrent-append guard, the admitted-count
  * contract, and pre-buckets index compaction. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r11_$tag").toString

  test("compactLeaf heals a file appended inside the read-then-swap window") {
    import s.implicits._
    val leaf = s"${freshDir("race")}/leaf"
    // fragment the leaf: two separate appends -> >=2 parquet files
    (0L until 50L).toDF("id").write.mode("append").parquet(leaf)
    (50L until 100L).toDF("id").write.mode("append").parquet(leaf)
    // race an admission append into the window AFTER the compaction scan
    // captured its file set but BEFORE the swap — the formerly-silent
    // data-loss window
    val n = graft.Jobs.compactLeafGuarded(s, leaf, midWrite = () =>
      (100L until 110L).toDF("id").write.mode("append").parquet(leaf))
    assert(n >= 1)
    s.catalog.clearCache()
    val after = s.read.parquet(leaf)
    assert(after.count() === 110L)
    assert(after.agg(sum("id")).head.getLong(0) === (0L until 110L).sum)
    // the appended file survived as-is (unfolded until the next pass):
    // a second, quiet compaction folds it in with no row change
    graft.Jobs.compactLeaf(s, leaf)
    s.catalog.clearCache()
    assert(s.read.parquet(leaf).count() === 110L)
  }

  test("admitToRetrievalIndex counts docs healed into ANY artifact on replay") {
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon"), (4L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = freshDir("count")
    RetrievalIndexOps.buildRetrievalIndex(s, docs, idx)
    val batch = Seq((10L, "alpha zeta omega"), (11L, "beta epsilon"))
      .toDF("doc_id", "text")
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 2L)
    // full replay: every artifact already has the batch -> 0
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 0L)
    // crash-heal replay that only completes doclens: simulate the crash
    // by deleting the doclens artifact's batch rows (rewrite from the
    // corpus-only doclens) — postings/vectors/buckets keep the batch
    s.catalog.clearCache()
    val corpusLens = s.read.parquet(s"$idx/doclens")
      .filter(col("doc_id") < 10L).collect()
    val lensSchema = s.read.parquet(s"$idx/doclens").schema
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(s"$idx/doclens").toFile)
    s.createDataFrame(java.util.Arrays.asList(corpusLens: _*), lensSchema)
      .write.mode("overwrite").parquet(s"$idx/doclens")
    s.catalog.clearCache()
    // the heal appends ONLY doclens rows — the count must still report
    // the docs that contributed (the docstring's distinct-union contract)
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 2L)
    s.catalog.clearCache()
    assert(s.read.parquet(s"$idx/doclens").filter(col("doc_id") >= 10L)
      .count() === 2L)
  }

  test("hybrid_retrieval_ivf fuses the IVF dense leg with the lexical leg") {
    import graft.operators.{RetrievalOps, TextOps}
    val fused = RetrievalOps.hybridRetrievalIvf(s, sf).collect()
    assert(fused.nonEmpty)
    // leg provenance: every nonzero sem_rnk is exactly the IVF leg's
    // rank for that (q, n) pair, every nonzero lex_rnk the lexical
    // leg's — the fusion is definitionally pinned to the two keys
    val sem = TextOps.docNeighborsIvf(s, sf, RetrievalOps.PoolK).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Long]("rnk")).toMap
    val lex = RetrievalOps.lexicalNeighbors(s, sf, RetrievalOps.PoolK).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Long]("rnk")).toMap
    fused.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      val (sr, lr) = (r.getAs[Long]("sem_rnk"), r.getAs[Long]("lex_rnk"))
      if (sr > 0) assert(sem(key) === sr) else assert(!sem.contains(key))
      if (lr > 0) assert(lex(key) === lr) else assert(!lex.contains(key))
      val e = (if (sr > 0) RetrievalOps.RrfScale / (RetrievalOps.RrfK0 + sr) else 0L) +
        (if (lr > 0) RetrievalOps.RrfScale / (RetrievalOps.RrfK0 + lr) else 0L)
      assert(r.getAs[Long]("rrf_e6") === e)
    }
    s.catalog.clearCache()
  }

  test("ann_index_stats sentinel row surfaces unindexed corpus vectors") {
    import graft.operators.{AnnIndexOps, ClusterOps}
    val corpus = Tables.embeddings(s, sf).select("vec_id", "embedding")
    val split = ClusterOps.SemSplit
    val slice = corpus.filter(col("vec_id") < split)
    val idx = freshDir("unidx")
    AnnIndexOps.buildAnnIndex(slice, idx)
    s.catalog.clearCache()
    val panel = AnnIndexOps.annIndexStatsOf(s, idx, corpus).collect()
    val sentinel = panel.filter(_.getLong(0) == -1L)
    assert(sentinel.length === 1)
    val expected = corpus.count() - slice.count()
    assert(expected > 0L)
    assert(sentinel.head.getLong(1) === expected)
    assert(math.abs(sentinel.head.getDouble(2) -
      expected.toDouble / corpus.count()) < 1e-12)
    assert(sentinel.head.isNullAt(3))
    // per-cell membership unchanged by the sentinel: sums to the slice
    assert(panel.filter(_.getLong(0) >= 0L).map(_.getLong(1)).sum === slice.count())
    s.catalog.clearCache()
  }

  test("zorder_geometry: rank-octile boxes cover all rows and order by z") {
    import graft.operators.LayoutOps
    val g = LayoutOps.zorderGeometry(s, sf).collect()
    assert(g.length === 8)
    assert(g.map(_.getAs[Long]("octile")).toSeq === (1L to 8L))
    val total = Tables.eventsUs(s, sf).count()
    assert(g.map(_.getAs[Long]("rows")).sum === total)
    // ntile balance: octile sizes differ by at most 1
    val sizes = g.map(_.getAs[Long]("rows"))
    assert(sizes.max - sizes.min <= 1L)
    // each octile's box is a subset of the global span, and boxes are
    // nondegenerate on at least one dimension
    g.foreach { r =>
      assert(r.getAs[Long]("mn_user_id") <= r.getAs[Long]("mx_user_id"))
      assert(r.getAs[Long]("mn_us") <= r.getAs[Long]("mx_us"))
    }
    s.catalog.clearCache()
  }

  test("compactRetrievalIndex skips an index with no buckets artifact") {
    import s.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val idx = freshDir("nobuckets")
    RetrievalIndexOps.buildRetrievalIndex(s, docs, idx)
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(s"$idx/buckets").toFile)
    // pre-buckets layout: flat artifacts compact (or skip), no throw
    val n = RetrievalIndexOps.compactRetrievalIndex(s, idx)
    assert(n >= 0)
  }
}
