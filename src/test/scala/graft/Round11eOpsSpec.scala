package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Round 11: the landed graph-label store as a first-class probe key,
  * and NN-Descent-style link prediction over the embedding kNN graph.
  * The planted-square test pins exact RA/Jaccard integers; the keyed
  * tests pin store-vs-rebuild equality and score invariants. */
class Round11eOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("graph_label_probe: the landed store equals a full components rebuild") {
    val probe = GraphOps.graphLabelProbe(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val full = GraphOps.graphComponents(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(probe.nonEmpty)
    assert(probe.toSet === full.toSet)
    // memoized store: a second keyed call reads the same artifacts and
    // reproduces the result exactly
    val again = GraphOps.graphLabelProbe(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSet === probe.toSet)
  }

  test("link_prediction: planted square scores its two diagonals exactly") {
    val spark = s; import spark.implicits._
    // square 1-2-3-4-1: non-edges are the diagonals (1,3) and (2,4),
    // each with common neighbors = the other two corners, every degree 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = GraphOps.linkPredictOnEdges(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // RA = 1e6/2 + 1e6/2 = 1000000; Jaccard = 2e6/(2+2-2) = 1000000
    assert(got.toSet === Set(
      (1L, 3L, 2L, 1000000L, 1000000L),
      (2L, 4L, 2L, 1000000L, 1000000L)))
  }

  test("link_prediction: a path graph has no >=2-common-neighbor candidates") {
    val spark = s; import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(GraphOps.linkPredictOnEdges(e).collect().isEmpty)
  }

  test("link_prediction keyed run: canonical pairs, score bounds, non-adjacency") {
    val rows = GraphOps.linkPredict(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, common, ra, jacc) =>
      assert(u < v)
      assert(common >= GraphOps.LpMinCommon)
      assert(ra > 0L && ra <= common * 1000000L, "each RA term is <= 1e6/1")
      assert(jacc > 0L && jacc <= 1000000L)
    }
    // independent driver-side oracle: rebuild the kNN graph with the
    // exact DotE12 arithmetic (per-term floor(x*y*1e12+0.5)), then check
    // candidates are non-edges with the claimed common-neighbor counts
    val vecs = Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += math.floor(a(i).toDouble * b(i).toDouble * 1.0e12 + 0.5).toLong
        i += 1
      }
      acc
    }
    val nrm = vecs.map { case (id, v) => id -> dot(v, v) }
    val ids = vecs.keys.toArray.sorted
    val edges = scala.collection.mutable.Set[(Long, Long)]()
    ids.foreach { u =>
      val top = ids.filter(_ != u).map { v =>
        val cs = dot(vecs(u), vecs(v)).toDouble /
          (math.sqrt(nrm(u).toDouble) * math.sqrt(nrm(v).toDouble))
        (v, cs)
      }.sortBy { case (v, cs) => (-cs, v) }.take(GraphOps.KnnK)
      top.foreach { case (v, _) => edges += ((math.min(u, v), math.max(u, v))) }
    }
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    rows.foreach { case (u, v, common, _, _) =>
      assert(!edges.contains((u, v)), s"candidate ($u,$v) is an edge")
      assert((adj(u) intersect adj(v)).size.toLong === common, s"common($u,$v)")
    }
  }
}
