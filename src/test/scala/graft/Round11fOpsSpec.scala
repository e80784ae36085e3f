package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wordpiece
import graft.operators.{GraphOps, TokenizerOps}

/** Round 11: shortest-tokenization DP vs greedy (optimal_segment),
  * personalized PageRank, and deterministic hash-seeded random walks. */
class Round11fOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def buckets(vocab: Seq[String]) = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val b = Array.fill(maxLen)(new java.util.HashSet[String]())
    vocab.foreach(t => if (t.nonEmpty) b(t.length - 1).add(t))
    b
  }

  test("minTokens: greedy is suboptimal on the planted vocabulary") {
    val vocab = Seq("a", "b", "c", "d", "ab", "bcd")
    val b = buckets(vocab)
    assert(Wordpiece.segment("abcd", b).toSeq === Seq("ab", "c", "d"), "greedy = 3")
    assert(Wordpiece.minTokens("abcd", b) === 2L, "optimal a|bcd = 2")
    assert(Wordpiece.minTokens("", b) === 0L)
    assert(Wordpiece.minTokens("xyz", b) === 3L, "fallback chars count 1 each")
  }

  test("minTokens is a lower bound of the greedy walk on random words") {
    val vocab = Seq("a", "b", "ab", "ba", "aab", "bba")
    val b = buckets(vocab)
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rng.nextInt(10))).map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString
      val greedy = Wordpiece.segment(w, b).length.toLong
      val opt = Wordpiece.minTokens(w, b)
      assert(opt <= greedy, s"word $w")
      assert(opt >= (w.length + 2) / 3, s"word $w: no token longer than 3")
    }
  }

  test("optimal_segment keyed run: optimum <= greedy, ratio arithmetic") {
    val rows = TokenizerOps.optimalSegment(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nWords, nOpt, nWp, overhead) =>
      assert(nOpt >= nWords && nOpt <= nWp)
      assert(overhead === nWp * 1000000L / nOpt)
      assert(overhead >= 1000000L)
    }
    // cross-key consistency: the greedy column is wordpiece_tokens' count
    val wp = TokenizerOps.wordpieceTokens(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (docId, _, _, nWp, _) => assert(wp(docId) === nWp) }
  }

  test("graph_ppr: planted two-component graph keeps mass in the seeded component") {
    val spark = s; import spark.implicits._
    // components {c1,s5} and {c2,s6}; seed = customer 1 (node 2)
    val li = Seq((1L, 5L), (2L, 6L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val seeds = Seq(2L).toDF("node")
    val out = GraphOps.graphPprFrames(li, ord, seeds).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // unseeded component never gains mass
    assert(out(4L) === 0L && out(13L) === 0L)
    // seeded 2-cycle: r0=(1e12,0); each round r'(a)=tele_a + 0.85*r(b)
    // exact integer recurrence with deg=1:
    var rc = 1000000000000L; var rs = 0L
    (1 to GraphOps.PRIterations).foreach { _ =>
      val nc = 150000000000L + (85L * rs) / 100L
      val ns = (85L * rc) / 100L
      rc = nc; rs = ns
    }
    assert(out(2L) === rc && out(11L) === rs)
  }

  test("graph_ppr keyed run: seeds from the BUILDING segment, non-negative ranks") {
    val out = GraphOps.graphPpr(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall(_._3 >= 0L))
    assert(out.exists(_._3 > 0L), "some mass must flow")
    // global pagerank gives every node positive rank; PPR must not:
    // (a) every seed holds positive mass (teleport replenishes it each
    //     round), and (b) a node whose component contains NO seed can
    //     never gain mass — the real zero-rank invariant (the hop-limited
    //     variant inside a seeded component is graph-dependent).
    val seeds = graft.Tables.customer(s, sf)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .collect().map(_.getAs[Long]("c_custkey") * 2).toSet
    val comp = GraphOps.graphComponents(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val seededComps = comp.collect { case (n, c) if seeds(n) => c }.toSet
    val ranks = out.map(r => (r._1, r._3)).toMap
    assert(seeds.exists(comp.contains), "some seed must be in the graph")
    seeds.filter(comp.contains).foreach(sd =>
      assert(ranks(sd) > 0L, s"seed $sd must hold teleport mass"))
    comp.foreach { case (n, c) =>
      if (!seededComps(c))
        assert(ranks(n) === 0L, s"node $n is in an unseeded component")
    }
  }

  test("graph_random_walks: every step follows the seeded chooser on a planted graph") {
    val spark = s; import spark.implicits._
    val li = Seq((1L, 5L), (1L, 6L), (2L, 5L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val out = GraphOps.graphRandomWalksFrames(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // adjacency: c2->{s11,s13}, c4->{s11}, s11->{c2,c4}, s13->{c2}
    val adj = Map(2L -> Seq(11L, 13L), 4L -> Seq(11L),
      11L -> Seq(2L, 4L), 13L -> Seq(2L))
    val byStart = out.groupBy(_._1)
    assert(byStart.keySet === adj.keySet)
    byStart.foreach { case (start, rows) =>
      val path = rows.sortBy(_._3).map(_._2)
      assert(rows.map(_._3).sorted.toSeq === (0L to GraphOps.RwSteps.toLong))
      assert(path.head === start)
      path.toSeq.sliding(2).zipWithIndex.foreach { case (pair, idx) =>
        val (from, to) = (pair(0), pair(1))
        val step = idx + 1
        val nbrs = adj(from)
        val pick = (((from % 1000003L) * 2654435761L + step * 40503L) % nbrs.length).toInt
        assert(to === nbrs(pick), s"start $start step $step")
      }
    }
  }

  test("graph_random_walks keyed run: one walk per node, edges real, deterministic") {
    val rows = GraphOps.graphRandomWalks(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byStart = rows.groupBy(_._1)
    byStart.foreach { case (_, walk) =>
      assert(walk.length === GraphOps.RwSteps + 1)
      assert(walk.map(_._3).sorted.toSeq === (0L to GraphOps.RwSteps.toLong))
    }
    // walk edges alternate bipartite sides (customer even / supplier odd)
    byStart.foreach { case (_, walk) =>
      walk.sortBy(_._3).map(_._2).toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert((pair(0) + pair(1)) % 2 === 1, "co-purchase graph is bipartite")
      }
    }
    val again = GraphOps.graphRandomWalks(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
}
