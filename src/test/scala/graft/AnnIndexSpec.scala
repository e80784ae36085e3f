package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndexOps, ClusterOps}

/** The landed IVF-PQ index: build artifacts, probe parity with the
  * in-query-training composition, and replay-idempotent admission. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_annidx_spec_$tag").toString

  test("buildAnnIndex lands coarse/codebooks/codes with the expected shapes") {
    val dir = freshDir("shape")
    val corpus = Tables.embeddings(s, sf).select("vec_id", "embedding")
    AnnIndexOps.buildAnnIndex(corpus, dir)
    s.catalog.clearCache()
    val coarse = s.read.parquet(s"$dir/coarse")
    val books = s.read.parquet(s"$dir/codebooks")
    val codes = s.read.parquet(s"$dir/codes")
    assert(coarse.count() == ClusterOps.CoarseCells)
    assert(books.count() == ClusterOps.PqM * ClusterOps.PqK)
    assert(books.select("subspace").distinct().count() == ClusterOps.PqM)
    assert(codes.count() == corpus.count())
    assert(codes.select("vec_id").distinct().count() == corpus.count())
    // partitioned by cell: every cell value is one of the coarse ids
    val cells = codes.select(col("cell").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    val coarseIds = coarse.select("cluster").collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(coarseIds) && cells.size <= ClusterOps.CoarseCells)
    s.catalog.clearCache()
  }

  test("ann_index_probe is bit-identical to ann_ivf_pq (landed == in-query training)") {
    val probe = AnnIndexOps.annIndexProbe(s, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Long]("adist"), r.getAs[Long]("rnk"))).toSeq
    s.catalog.clearCache()
    val composed = ClusterOps.annIvfPq(s, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Long]("adist"), r.getAs[Long]("rnk"))).toSeq
    s.catalog.clearCache()
    assert(probe.nonEmpty)
    assert(probe == composed,
      s"landed-index probe diverged from the composed key: " +
        s"${probe.diff(composed).take(3)} vs ${composed.diff(probe).take(3)}")
  }

  test("probe plan: the codes scan is dynamically partition-pruned on cell") {
    // the scale contract of the cell-partitioned layout: the probed-cells
    // equi-join must reach the codes FileScan as a dynamic partition
    // pruning subquery, so a probe reads ~nprobe/cells of the files
    // instead of the whole index
    val plan = AnnIndexOps.annIndexProbe(s, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "probed-cells join must dynamic-partition-prune the codes scan")
    s.catalog.clearCache()
  }

  test("admitToIndex appends new vectors once; replay appends nothing") {
    val dir = freshDir("admit")
    val split = ClusterOps.SemSplit
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < split)
    val batch = emb.filter(col("vec_id") >= split)
    AnnIndexOps.buildAnnIndex(corpus, dir)
    s.catalog.clearCache()
    val nCorpus = corpus.count()
    val nBatch = batch.count()
    assert(nBatch > 0, "no batch rows above the split — testdata drift")
    val admitted = AnnIndexOps.admitToIndex(s, dir, batch)
    s.catalog.clearCache()
    assert(admitted == nBatch, s"expected $nBatch admitted, got $admitted")
    assert(s.read.parquet(s"$dir/codes").count() == nCorpus + nBatch)
    // at-least-once replay: same batch again → zero new rows, index unchanged
    val replayed = AnnIndexOps.admitToIndex(s, dir, batch)
    s.catalog.clearCache()
    assert(replayed == 0, s"replay admitted $replayed rows — not idempotent")
    assert(s.read.parquet(s"$dir/codes").count() == nCorpus + nBatch)
    // partial-failure replay: a half batch after the full one adds nothing
    val half = AnnIndexOps.admitToIndex(s, dir,
      batch.filter(col("vec_id") % 2 === 0))
    s.catalog.clearCache()
    assert(half == 0)
  }

  test("landAnnIndexAdmissionStream: micro-batches grow the index; replay appends nothing") {
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("stream")
    val split = ClusterOps.SemSplit
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding")
    AnnIndexOps.buildAnnIndex(emb.filter(col("vec_id") < split), dir)
    s.catalog.clearCache()
    val nCorpus = emb.filter(col("vec_id") < split).count()
    val batchRows = emb.filter(col("vec_id") >= split).collect()
      .map(r => (r.getAs[Number]("vec_id").longValue,
        r.getSeq[Float](r.fieldIndex("embedding"))))
    assert(batchRows.length >= 2)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    val in = MemoryStream[(Long, Seq[Float])](s)
    val q = graft.streaming.EventStreams.landAnnIndexAdmissionStream(
      in.toDF().toDF("vec_id", "embedding"), dir)
    try {
      in.addData(b1.toSeq); q.processAllAvailable()
      assert(s.read.parquet(s"$dir/codes").count() == nCorpus + b1.length)
      in.addData(b2.toSeq); q.processAllAvailable()
      // replayed delivery of batch 1 inside the stream: no growth
      in.addData(b1.toSeq); q.processAllAvailable()
      val codes = s.read.parquet(s"$dir/codes")
      assert(codes.count() == nCorpus + batchRows.length,
        "replayed micro-batch must not re-append")
      assert(codes.select("vec_id").distinct().count() == codes.count())
      // streamed assignments are IDENTICAL to the batch admission path
      val streamed = codes.filter(col("vec_id") >= split)
        .select(col("vec_id") +: col("cell").cast("long").as("cell") +:
          (0 until ClusterOps.PqM).map(i => col(s"c$i")): _*)
        .orderBy("vec_id").collect().toSeq
      s.catalog.clearCache()
      val direct = AnnIndexOps.assignToIndex(s, dir,
          emb.filter(col("vec_id") >= split)).drop("err")
        .orderBy("vec_id").collect().toSeq
      assert(streamed == direct, "stream admission diverged from batch admission")
    } finally q.stop()
    s.catalog.clearCache()
  }

  test("grow-then-search: the probe over the grown index surfaces admitted vectors") {
    val split = ClusterOps.SemSplit
    val out = AnnIndexOps.annIndexProbeAdmitted(s, sf).collect()
    s.catalog.clearCache()
    assert(out.nonEmpty)
    // admitted vectors (vec_id >= split) must be reachable as neighbors —
    // the whole point of admission is that landed vectors are searchable
    assert(out.exists(_.getAs[Long]("n_id") >= split),
      "no admitted vector ever surfaced as a neighbor")
    // queries above the split get answers too (they are index members)
    assert(out.exists(_.getAs[Long]("q_id") >= split))
    // idempotence: a second call (admit re-runs as a no-op) is identical
    val again = AnnIndexOps.annIndexProbeAdmitted(s, sf).collect()
    s.catalog.clearCache()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("admitted codes match the keyed frozen-assignment query row-for-row") {
    val dir = freshDir("assign")
    val split = ClusterOps.SemSplit
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding")
    AnnIndexOps.buildAnnIndex(emb.filter(col("vec_id") < split), dir)
    s.catalog.clearCache()
    val assigned = AnnIndexOps
      .assignToIndex(s, dir, emb.filter(col("vec_id") >= split))
    // admission never mutates cells/codes between calls: assignment is a
    // pure function of the frozen artifacts
    val again = AnnIndexOps
      .assignToIndex(s, dir, emb.filter(col("vec_id") >= split))
    assert(assigned.collect().toSeq == again.collect().toSeq)
    s.catalog.clearCache()
    // every admitted vector got a real cell and M codes in range
    val bad = assigned.filter(col("cell").isNull ||
      (0 until ClusterOps.PqM).map(i =>
        col(s"c$i") < 0 || col(s"c$i") >= 1000000L).reduce(_ || _))
    assert(bad.count() == 0)
    s.catalog.clearCache()
  }

  test("compactAnnIndex: fragmented cells fold to one file each; probe frame unchanged") {
    import java.nio.file.{Files, Path, Paths}
    def parquetFiles(dir: String): Seq[Path] = {
      val st = Files.walk(Paths.get(dir))
      try st.toArray.map(_.asInstanceOf[Path]).toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
      finally st.close()
    }
    val dir = freshDir("compact")
    val split = ClusterOps.SemSplit
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding")
    AnnIndexOps.buildAnnIndex(emb.filter(col("vec_id") < split), dir)
    s.catalog.clearCache()
    // two admission batches: every touched cell gains extra small files
    val mid = split + (2000 - split) / 2
    AnnIndexOps.admitToIndex(s, dir,
      emb.filter(col("vec_id") >= split && col("vec_id") < mid))
    AnnIndexOps.admitToIndex(s, dir, emb.filter(col("vec_id") >= mid))
    val before = AnnIndexOps.probeAnnIndex(s, dir, emb).collect()
      .map(_.toString).toSeq
    s.catalog.clearCache()
    val rowsBefore = s.read.parquet(s"$dir/codes").count()
    val filesBefore = parquetFiles(s"$dir/codes").size
    val rewritten = AnnIndexOps.compactAnnIndex(s, dir)
    assert(rewritten > 0, "admission fragmented at least one cell")
    val filesAfter = parquetFiles(s"$dir/codes").size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    assert(s.read.parquet(s"$dir/codes").count() == rowsBefore,
      "compaction is pure layout: no row may appear or vanish")
    val after = AnnIndexOps.probeAnnIndex(s, dir, emb).collect()
      .map(_.toString).toSeq
    s.catalog.clearCache()
    assert(after == before, "probe results must be bit-identical post-compaction")
    // quiet-day run: nothing fragmented, nothing rewritten
    assert(AnnIndexOps.compactAnnIndex(s, dir) == 0)
  }
}
