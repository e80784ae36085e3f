package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndexOps, ClusterOps, RetrievalIndexOps}

/** Regression for the round-13 parallel-Verify race: N concurrent
  * FIRST-TOUCH callers of the grow-then-read index keys must each
  * observe the fully admitted store. Two mechanisms make this hold
  * (both landed r13, each caught live as a once-per-gate stats flake
  * reading 0 admitted docs):
  *
  *   1. the once-per-store admission memo is a BLOCKING
  *      `computeIfAbsent` — a sibling key waits for the in-flight
  *      admission instead of reading the store mid-append;
  *   2. `ensureAdmitted` ends with `catalog.refreshByPath(store)` for
  *      EVERY caller — a session-wide file-listing cache entry
  *      re-populated by a load racing the append's own invalidation
  *      can otherwise pin the pre-append file set for that reader.
  *
  * The corpus tables are COPIED to a fresh dir per test: the build/
  * admission memos key on the dir fingerprint, so a fresh dir is what
  * actually exercises the first-touch window (racing the shared sf
  * dir would only re-read an already-admitted memoized store). */
class IndexConcurrencySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private val Racers = 6 // == the Verify default parallelism

  private def freshCorpusDir(tables: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_conc").toString
    tables.foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, s"$t.parquet"),
        java.nio.file.Paths.get(d, s"$t.parquet"))
    }
    d
  }

  /** Run `f` on `Racers` threads at once and return every thread's
    * result (any thread's failure propagates). */
  private def race[T](f: () => T): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Racers)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val futs = (1 to Racers).map(_ => Future(f()))
      futs.map(Await.result(_, 600.seconds))
    } finally pool.shutdown()
  }

  test("retrieval index: concurrent first-touch callers all see the fully admitted store") {
    val dir = freshCorpusDir(Seq("documents"))
    def stats(): Map[String, Long] =
      RetrievalIndexOps.retrievalIndexStats(s, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val raced = race(stats)
    val ref = stats() // post-join sequential read of the same memoized store
    assert(ref("admitted_docs_dense") > 0L,
      "the sf corpus must actually admit a batch or the race is vacuous")
    assert(ref("doclens_docs") === ref("postings_docs"),
      "consistency panel: a crashed admission would split these")
    raced.zipWithIndex.foreach { case (m, i) =>
      assert(m === ref, s"racer $i observed a partial store") }
    s.catalog.clearCache()
  }

  test("ann index: concurrent first-touch probes all see the fully admitted store") {
    val dir = freshCorpusDir(Seq("embeddings"))
    def probe(): Seq[(Long, Long, Long, Long)] =
      AnnIndexOps.annIndexProbeAdmitted(s, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val raced = race(probe)
    val ref = probe()
    // the probe must surface admitted vectors (vec_id >= SemSplit ids
    // appear as neighbors) — otherwise every racer agreeing on the
    // pre-admission store would pass vacuously
    assert(ref.exists(_._2 >= ClusterOps.SemSplit),
      "admitted vectors must be searchable in the reference probe")
    raced.zipWithIndex.foreach { case (p, i) =>
      assert(p === ref, s"racer $i probed a partial store") }
    s.catalog.clearCache()
  }
}
