package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Incremental walk-corpus maintenance (round 13): the replay theorem
  * — a deterministic walk whose visited choice-step nodes all miss the
  * delta's endpoints replays bit-identically on the grown graph — and
  * its executor [[GraphOps.refreshWalksIncremental]]. The planted
  * two-component graph pins three things the sf oracle can't isolate:
  * minimal invalidation (the untouched component is KEPT, not
  * recomputed), first-walks for brand-new nodes, and re-admission
  * being a no-op. */
class WalkRefreshSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def walkSet(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

  test("planted refresh: exact equality with from-scratch, minimal invalidation, new-node walks") {
    import s.implicits._
    // component A: path 1-2-3 (untouched); component B: edge 10-11,
    // grown by the delta edge 10-12 (new node 12); (1,2) re-admits
    val corpus = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("c", "s")
    val batch = Seq((10L, 12L), (1L, 2L)).toDF("c", "s")
    val delta = batch.join(corpus, Seq("c", "s"), "left_anti")
    for (walker <- Seq(
        GraphOps.randomWalksOnPairs(_, _),
        GraphOps.node2vecWalksOnPairs(_, _))) {
      val old = walker(corpus, None)
      // walks from 10 (visits itself at step 0) and 11 (its only
      // neighbor is 10) invalidate; the whole of component A must not
      val inv = GraphOps.invalidatedWalkStarts(old, delta)
        .collect().map(_.getLong(0)).toSet
      assert(inv === Set(10L, 11L),
        "exactly the walks visiting a delta endpoint invalidate")
      val refreshed =
        GraphOps.refreshWalksIncremental(old, corpus, batch, walker)
      assert(walkSet(refreshed) ===
        walkSet(walker(corpus.union(batch).distinct(), None)),
        "keep ∪ redo must equal walking the grown graph from scratch")
      // new node 12 walks for the first time; all six starts covered
      assert(refreshed.select("start").distinct().collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 10L, 11L, 12L))
      s.catalog.clearCache()
    }
  }

  test("re-admitting already-landed pairs refreshes nothing") {
    import s.implicits._
    val corpus = Seq((1L, 2L), (2L, 3L)).toDF("c", "s")
    val batch = Seq((2L, 3L)).toDF("c", "s")
    val old = GraphOps.randomWalksOnPairs(corpus)
    val refreshed = GraphOps.refreshWalksIncremental(
      old, corpus, batch, GraphOps.randomWalksOnPairs(_, _))
    assert(walkSet(refreshed) === walkSet(old),
      "an empty delta must keep the corpus byte-identical")
    s.catalog.clearCache()
  }

  test("sf data: incremental == from-scratch for both walk orders") {
    assert(walkSet(GraphOps.walksIncremental(s, sf)) ===
      walkSet(GraphOps.graphRandomWalks(s, sf)))
    assert(walkSet(GraphOps.node2vecWalksIncremental(s, sf)) ===
      walkSet(GraphOps.graphNode2vecWalks(s, sf)))
    s.catalog.clearCache()
  }
}
