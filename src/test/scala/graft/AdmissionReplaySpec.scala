package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** foreachBatch is at-least-once: [[EventStreams.admitBatch]] must be
  * idempotent under (a) full batch redelivery after a clean commit and
  * (b) redelivery after a partial failure where the verdict append
  * committed but the index appends did not. Both replays must leave the
  * store byte-for-byte equivalent (same rows) — in particular, a
  * replayed admitted doc must NOT re-pair with its own index entry and
  * flip to dup_of_corpus. */
class AdmissionReplaySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  private val tA = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn every single day"
  private val tB = "completely different content about spark engines and columnar execution at warehouse scale with vectorized readers"
  private val tC = "a third body of text with yet another distinct vocabulary covering gardening tips for arid climates in summer"

  private def store(dir: String): (Map[Long, (Boolean, Boolean, Boolean)], Long, Set[Long], Long, Set[Long]) = {
    val v = s.read.parquet(s"$dir/verdicts")
    val verd = v.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("dup_in_batch"),
        r.getAs[Boolean]("keep")))).toMap
    val bk = s.read.parquet(s"$dir/buckets")
    val sh = s.read.parquet(s"$dir/shingles")
    (verd, v.count(),
      bk.select("doc_id").distinct().collect().map(_.getLong(0)).toSet, bk.count(),
      sh.select("doc_id").distinct().collect().map(_.getLong(0)).toSet)
  }

  test("full-batch replay after commit: verdicts and index unchanged") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val b1 = Seq((1L, tA), (2L, tB), (3L, tA)).toDF("doc_id", "text")
    val b2 = Seq((10L, tA), (11L, tC)).toDF("doc_id", "text")
    EventStreams.admitBatch(b1, 0L, dir, 0.5)
    EventStreams.admitBatch(b2, 1L, dir, 0.5)
    val before = store(dir)
    // sanity on the pre-replay state: 1,2,11 admitted, 3 in-batch dup,
    // 10 dups the indexed doc 1
    assert(before._1 == Map(
      1L -> ((false, false, true)), 2L -> ((false, false, true)),
      3L -> ((false, true, false)), 10L -> ((true, false, false)),
      11L -> ((false, false, true))))
    assert(before._2 == 5L, "exactly one verdict row per doc")
    assert(before._3 == Set(1L, 2L, 11L), "only admitted docs indexed")

    EventStreams.admitBatch(b2, 1L, dir, 0.5) // redelivery of batch 1
    assert(store(dir) == before,
      "a replayed committed batch must change nothing")
    EventStreams.admitBatch(b1, 0L, dir, 0.5) // even the FIRST batch
    assert(store(dir) == before,
      "replaying batch 0 must not re-verdict docs against their own index entries")
    s.catalog.clearCache()
  }

  test("replay after partial failure (verdicts landed, index lost) completes the index") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_partial").toString
    val b1 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    EventStreams.admitBatch(b1, 0L, dir, 0.5)
    val verdBefore = store(dir)._1
    // simulate dying between the verdict append and the index appends:
    // wipe both index targets, keep the verdicts
    def rmr(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmr)
      p.delete(); ()
    }
    rmr(new java.io.File(s"$dir/buckets"))
    rmr(new java.io.File(s"$dir/shingles"))

    EventStreams.admitBatch(b1, 0L, dir, 0.5) // redelivery
    val after = store(dir)
    assert(after._1 == verdBefore, "no duplicate or contradictory verdicts")
    assert(after._2 == 2L, "still one verdict row per doc")
    assert(after._3 == Set(1L, 2L), "index rebuilt from the landed keep verdicts")
    assert(after._5 == Set(1L, 2L), "shingle side rebuilt too")

    // batch 2 still screens correctly against the recovered index
    EventStreams.admitBatch(Seq((10L, tA)).toDF("doc_id", "text"), 1L, dir, 0.5)
    assert(store(dir)._1(10L) == ((true, false, false)),
      "post-recovery batches hit the rebuilt index")
    s.catalog.clearCache()
  }
}
