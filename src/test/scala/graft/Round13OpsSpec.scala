package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Round 13: the node2vec hub-candidate bound (capped adjacency), the
  * unified graph store landing both walk corpora beside `edges/`, the
  * second-order PMI consumer, and Bench's cheap-tail-last degradation
  * order. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def freshDir(tag: String): String =
    graft.TempStores.scratchDir(s"graft_r13_$tag")

  test("n2vCappedAdjacency: a star hub is bounded at N2vNbrCap, leaves untouched") {
    import s.implicits._
    // one hub (node 1), 100 leaves — every walk that reaches the hub
    // would otherwise materialize deg(hub)=100 candidate rows per step
    val nLeaves = 100
    assert(nLeaves > GraphOps.N2vNbrCap, "the star must exercise the cap")
    val pairs = (1 to nLeaves).map(i => (1L, 100L + i)).toDF("c", "s")
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    val capped = GraphOps.n2vCappedAdjacency(edges)
      .groupBy("a_src").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped(1L) === GraphOps.N2vNbrCap.toLong,
      "hub candidate list capped exactly at N2vNbrCap")
    (1 to nLeaves).foreach(i => assert(capped(100L + i) === 1L, "leaves keep their one edge"))
    // per-step candidate volume on the star ≤ walks·cap: every one of
    // the 101 walks sits on either the hub (≤ cap candidates) or a
    // leaf (1 candidate) — total ≤ walks·cap, never walks·deg(hub)
    assert(capped.values.sum <= (nLeaves + 1).toLong * GraphOps.N2vNbrCap)
    s.catalog.clearCache()
  }

  test("node2vec_walks on the star: capped walks replay an independent capped implementation") {
    import s.implicits._
    val nLeaves = 100
    val pairs = (1 to nLeaves).map(i => (1L, 100L + i)).toDF("c", "s")
    val out = GraphOps.node2vecWalksOnPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.catalog.clearCache()
    // independent implementation: same hash permutation, same cap, same
    // weighted-CDF draw — plain Scala, no Spark
    val full: Map[Long, Seq[Long]] =
      (Map(1L -> (1 to nLeaves).map(i => 100L + i)) ++
        (1 to nLeaves).map(i => (100L + i) -> Seq(1L))).toMap
    val eset = (1 to nLeaves).flatMap(i =>
      Seq((1L, 100L + i), (100L + i, 1L))).toSet
    def cappedNbrs(src: Long): Seq[Long] = full(src)
      .sortBy(d => (((d % 1000003L) * 2654435761L + src * 40503L) % 1000000007L, d))
      .take(GraphOps.N2vNbrCap)
      .sorted
    def walk(start: Long): Seq[Long] = {
      var prev = -1L; var cur = start
      var path = Seq(start)
      (1 to GraphOps.RwSteps).foreach { i =>
        val ns = cappedNbrs(cur)
        val wts = ns.map(x =>
          if (x == prev) GraphOps.N2vReturnW
          else if (eset((prev, x))) GraphOps.N2vTriadW
          else GraphOps.N2vOutW)
        val tot = wts.sum
        val r = ((cur % 1000003L) * 2654435761L + i * 40503L) % tot
        var cum = 0L; var pick = -1L
        ns.zip(wts).foreach { case (x, w) =>
          if (pick < 0) { cum += w; if (r < cum) pick = x } }
        prev = cur; cur = pick; path = path :+ cur
      }
      path
    }
    val starts = full.keySet
    val byStart = out.groupBy(_._1)
    assert(byStart.keySet === starts)
    byStart.foreach { case (st, rows) =>
      assert(rows.sortBy(_._3).map(_._2).toSeq === walk(st), s"start $st")
      // every hop must still be a REAL edge — the cap prunes candidates,
      // never invents them
      rows.sortBy(_._3).map(_._2).sliding(2).foreach(p =>
        assert(eset((p(0), p(1))), s"non-edge hop at start $st"))
    }
  }

  test("graphStore lands both walk corpora; store-derived equals from-scratch") {
    val base = GraphOps.graphStore(s, sf)
    for ((sub, fresh) <- Seq(
        ("walks", GraphOps.graphRandomWalks(s, sf)),
        ("walks_n2v", GraphOps.graphNode2vecWalks(s, sf)))) {
      val landed = s.read.parquet(s"$base/$sub")
        .select("start", "node", "step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val scratch = fresh.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      s.catalog.clearCache()
      assert(landed.nonEmpty, s"$sub landed empty")
      assert(landed === scratch,
        s"$sub: store-derived (from landed edges/) must equal from-scratch")
    }
  }

  test("node2vec_pmi equals the panel over a fresh second-order corpus") {
    val keyed = GraphOps.node2vecPmi(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
    val fresh = GraphOps.walkPmiOf(
      GraphOps.graphNode2vecWalks(s, sf).select("start", "node", "step"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
    s.catalog.clearCache()
    assert(keyed.nonEmpty && keyed === fresh)
    // the bias must actually change the sampled co-occurrences at the
    // check corpus — otherwise the key is walk_pmi renamed
    val first = GraphOps.walkPmi(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    s.catalog.clearCache()
    assert(keyed.map(t => (t._1, t._2, t._3)) !== first,
      "second-order PMI must differ from the first-order panel")
  }

  test("pmi_ann_agreement tail: replay against an independent top-T overlap") {
    import s.implicits._
    // bridge-of-triangles: window-2 skip-gram pairs put 2-hop partners
    // in the PMI panel, so tops contain both direct edges (hits) and
    // non-edges (misses) — both branches of the LEFT join exercised
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("u", "v")
    val out = GraphOps.pmiAgreementOnEdges(e).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent tail: collect the (separately spec-pinned) PMI panel,
    // rank per node in plain Scala, overlap against the edge set
    val pmi = GraphOps.walkPmiOf(
      GraphOps.node2vecWalksOnPairs(e).select("start", "node", "step"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    s.catalog.clearCache()
    val eset = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val sym = pmi.flatMap { case (a, b, p) => Seq((a, b, p), (b, a, p)) }
    val expected = sym.groupBy(_._1).map { case (node, rows) =>
      val top = rows.sortBy { case (_, nb, p) => (-p, nb) }.take(GraphOps.PmiTopT)
      val hits = top.count { case (n, nb, _) =>
        eset((math.min(n, nb), math.max(n, nb))) }
      node -> ((top.length.toLong, hits.toLong,
        hits.toLong * 1000000L / top.length))
    }
    assert(out === expected)
    assert(out.values.exists { case (t, h, _) => h < t }, "a miss must occur")
    assert(out.values.exists { case (_, h, _) => h > 0 }, "a hit must occur")
  }

  test("Bench.warmOrder: cheapest-first, failures excluded") {
    val p1 = Seq(("heavy", 20.0), ("cheap", 0.5), ("mid", 3.0),
      ("broken", -1.0), ("cheap2", 0.5))
    assert(Bench.warmOrder(p1) === Seq("cheap", "cheap2", "mid", "heavy"))
    assert(Bench.defaultBudgetSec(100) === 1500.0, "floor holds for small surfaces")
    assert(Bench.defaultBudgetSec(200) === 1600.0, "scales at 8 s/key past the floor")
  }

  test("TempStores.fingerprint catches a same-size same-mtime content rewrite") {
    val d = freshDir("fp13")
    val f = java.nio.file.Paths.get(d, "t.bin")
    java.nio.file.Files.write(f, "aaaa".getBytes)
    val mt = java.nio.file.Files.getLastModifiedTime(f)
    val fp1 = TempStores.fingerprint(d)
    java.nio.file.Files.write(f, "bbbb".getBytes) // same size
    java.nio.file.Files.setLastModifiedTime(f, mt) // same mtime
    assert(TempStores.fingerprint(d) !== fp1,
      "byte sample must catch a rewrite metadata can't see")
    // and files longer than one sample window differ on tail-only edits
    val big = ("x" * 200) + "HEAD"
    java.nio.file.Files.write(f, big.getBytes)
    val fp2 = TempStores.fingerprint(d)
    java.nio.file.Files.write(f, (("x" * 200) + "TAIL").getBytes)
    java.nio.file.Files.setLastModifiedTime(f, mt)
    assert(TempStores.fingerprint(d) !== fp2, "tail sample covers the file end")
  }
}
