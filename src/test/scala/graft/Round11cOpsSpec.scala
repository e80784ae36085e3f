package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CoreOps, GraphOps, QuantOps}

/** Round 11 graph-analytics family (components / triangles / label
  * propagation) + the IVF-SQ quantization composition. Planted-graph
  * tests pin exact expected values independently of the DuckDB twins;
  * the keyed-run tests pin cross-operator consistency on real data. */
class Round11cOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf
  import scala.jdk.CollectionConverters._

  private def ordersOf(rows: Seq[(Long, Long)]) = {
    // (o_orderkey, o_custkey)
    val spark = s; import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey")
  }
  private def lineitemOf(rows: Seq[(Long, Long)]) = {
    // (l_orderkey, l_suppkey)
    val spark = s; import spark.implicits._
    rows.toDF("l_orderkey", "l_suppkey")
  }

  test("graph_components: planted two-component graph labels by component min") {
    val ord = ordersOf(Seq((1L, 1L), (2L, 2L)))
    val li = lineitemOf(Seq((1L, 5L), (2L, 6L)))
    val out = GraphOps.graphComponentsFrames(li, ord).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // node packing: cust c -> 2c, supp s -> 2s+1
    assert(out.toSet === Set(
      (2L, "customer", 1L, 2L, 2L), (11L, "supplier", 5L, 2L, 2L),
      (4L, "customer", 2L, 4L, 2L), (13L, "supplier", 6L, 4L, 2L)))
  }

  test("graph_components keyed run: component ids are member minima, sizes consistent") {
    val out = GraphOps.graphComponents(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // component id is the min node id of its member set
    val byComp = out.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp)
      assert(members.forall(_._3 === members.size))
    }
    // driver-side union-find over the SAME edge definition reproduces it
    val li = Tables.lineitem(s, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, sf).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    out.foreach { case (n, comp, _) => assert(expected(n) === comp, s"node $n") }
  }

  test("graph_triangles: planted triangle + pendant + sub-threshold edge") {
    // suppliers 1,2,3 pairwise co-occur on 3 orders (triangle);
    // supplier 4 rides those same orders with 1 only (pendant edge);
    // supplier 5 co-occurs with 1 on just 2 orders (below threshold)
    val ord = ordersOf((1L to 5L).map(k => (k, 1L)))
    val li = lineitemOf(
      (1L to 3L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
        (1L to 3L).map(o => (o, 4L)) ++      // 4 with {1,2,3} 3× each
        Seq((4L, 1L), (4L, 5L), (5L, 1L), (5L, 5L))) // 1-5 only 2×
    // NOTE: supplier 4 co-occurs with 1,2,3 three times each -> edges
    // (1,4),(2,4),(3,4) ALL survive, so 4 closes triangles with every
    // pair: expected graph is K4 on {1,2,3,4}, and 5 is excluded.
    val out = GraphOps.graphTrianglesFrames(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // K4: degree 3 each, C(3,2)=3 triangles per node, clustering 1.0
    assert(out === Set(
      (1L, 3L, 3L, 1000000L), (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L), (4L, 3L, 3L, 1000000L)))
  }

  test("graph_triangles keyed run: degree-oriented count matches driver-side brute force") {
    val out = GraphOps.graphTriangles(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // recompute edges + brute-force triangles driver-side
    val li = Tables.lineitem(s, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, sf).select("o_orderkey")
    val os = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = os.groupBy(_._1).values
    val coCount = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.foreach { rows =>
      val sks = rows.map(_._2).sorted
      for (i <- sks.indices; j <- (i + 1) until sks.size)
        coCount((sks(i), sks(j))) = coCount.getOrElse((sks(i), sks(j)), 0) + 1
    }
    val edges = coCount.filter(_._2 >= GraphOps.SuppMinCoOrders).keys.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val triOf = adj.keys.map { n =>
      val nb = adj(n).toSeq.sorted
      n -> (for (i <- nb.indices; j <- (i + 1) until nb.size
        if adj(nb(i)).contains(nb(j))) yield 1).size.toLong
    }.toMap
    out.foreach { case (sk, deg, tri, clus) =>
      assert(deg === adj(sk).size.toLong, s"degree of $sk")
      assert(tri === triOf(sk), s"triangles of $sk")
      val expClus = if (deg >= 2) 2L * tri * 1000000L / (deg * (deg - 1)) else 0L
      assert(clus === expClus, s"clustering of $sk")
    }
  }

  test("label propagation separates two planted cliques joined by one bridge") {
    val spark = s; import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))).toDF("u", "v")
    val out = GraphOps.labelPropOnEdges(edges, GraphOps.LpaRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges onto its min label; the bridge can't flip a
    // node whose clique majority out-votes the single cross-edge
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet.size === 1)
    assert(Seq(10L, 11L, 12L, 13L).map(out).toSet.size === 1)
    assert(out(1L) !== out(10L))
  }

  test("graph_label_prop keyed run: communities are node ids, sizes consistent") {
    val out = GraphOps.graphLabelProp(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val nodes = out.map(_._1).toSet
    out.groupBy(_._2).foreach { case (comm, members) =>
      assert(nodes.contains(comm)) // labels propagate only existing node ids
      assert(members.forall(_._3 === members.size))
    }
  }

  test("incremental components: batch bridges corpus components and adds a new island") {
    val spark = s; import spark.implicits._
    val corpus = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val batch = Seq((2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = GraphOps.incrementalComponents(corpus, batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // contract: equals a full rebuild over corpus ∪ batch
    val full = graft.operators.DedupOps
      .connectedComponents(corpus.unionByName(batch)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === full)
  }

  test("graph_components_incremental keyed run equals the full-rebuild key row for row") {
    val incr = GraphOps.graphComponentsIncremental(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val full = GraphOps.graphComponents(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(incr.nonEmpty)
    assert(incr.toSeq === full.toSeq)
  }

  test("graph admission stream: batches fold into landed labels; replay is a no-op") {
    val spark = s; import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graph_admit").toString
    val input = MemoryStream[(Long, Long)](s)
    val q = graft.streaming.EventStreams.landGraphAdmissionStream(
      input.toDF().toDF("doc_a", "doc_b"), dir)
    // batch 0 bootstraps an empty store; batch 1 bridges + adds an island
    input.addData((1L, 2L), (3L, 4L)); q.processAllAvailable()
    input.addData((2L, 3L), (10L, 11L)); q.processAllAvailable()
    val landed = s.read.parquet(s"$dir/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(landed === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    q.stop()
    // replaying an already-folded batch must change nothing
    graft.streaming.EventStreams.admitGraphBatch(
      Seq((2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b"), 99L, dir)
    val replayed = s.read.parquet(s"$dir/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed === landed)
    // and the landed table equals a full CC over every edge ever delivered
    val full = graft.operators.DedupOps.connectedComponents(
      Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed === full)
  }

  test("graph_triangles: a 5000-leaf star cannot trigger the hub wedge blowup") {
    // unoriented wedge counting at the hub would enumerate C(5000,2) ≈
    // 12.5M wedges; degree orientation sources every edge at a LEAF
    // (out-degree 1) and the hub sources none — the op must return
    // instantly with zero triangles and the hub's full degree
    val spark = s; import spark.implicits._
    val n = 5000
    // leaves co-occur with the hub supplier on SuppMinCoOrders orders each
    val ord = (1L to (n.toLong * GraphOps.SuppMinCoOrders))
      .map(k => (k, 1L)).toDF("o_orderkey", "o_custkey")
    val li = (0 until n).flatMap { leaf =>
      (1 to GraphOps.SuppMinCoOrders).map { r =>
        val ok = (leaf * GraphOps.SuppMinCoOrders + r).toLong
        Seq((ok, 0L), (ok, (leaf + 1).toLong))
      }.flatten
    }.toDF("l_orderkey", "l_suppkey")
    val t0 = System.nanoTime()
    val out = GraphOps.graphTrianglesFrames(li, ord).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val hub = out.find(_.getLong(0) == 0L).get
    assert(hub.getLong(1) === n.toLong) // hub degree = all leaves
    assert(out.forall(_.getLong(2) === 0L)) // zero triangles anywhere
    assert(out.length === n + 1)
    assert(wall < 60.0, s"star graph took $wall s — hub wedge blowup?")
  }

  test("graph_bfs: planted path graph gets exact levels from the min node") {
    // chain c1(2)–s1(3)–c2(4)–s2(5)–c3(6): BFS from node 2
    val ord = ordersOf(Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L)))
    val li = lineitemOf(Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)))
    val out = GraphOps.graphBfsFrames(li, ord).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 4L))
  }

  test("graph_bfs keyed run matches a driver-side BFS replay") {
    val out = GraphOps.graphBfs(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.nonEmpty)
    val li = Tables.lineitem(s, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, sf).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val src = adj.keys.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = List(src)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(adj).distinct.filterNot(dist.contains)
      val d = dist.values.max + 1
      frontier.foreach(n => dist(n) = d)
    }
    assert(out === dist.toMap)
  }

  test("corr_matrix: one row per ordered pair, values match an exact-integer replay") {
    val out = CoreOps.corrMatrix(s, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val names = CoreOps.CorrMeasures.map(_._1)
    val expectedPairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    assert(out.keySet === expectedPairs.toSet)
    // exact-integer replay on collected cents
    val rows = Tables.lineitem(s, sf)
      .select(CoreOps.CorrMeasures.map { case (_, c) =>
        (col(c) * 100).cast("long").as(c) }: _*)
      .collect()
    val cols = names.indices.map(i => rows.map(r => BigInt(r.getLong(i))))
    val n = BigInt(rows.length)
    out.foreach { case ((x, y), (cnt, corr)) =>
      assert(cnt === rows.length.toLong)
      val (ix, iy) = (names.indexOf(x), names.indexOf(y))
      val (sx, sy) = (cols(ix).sum, cols(iy).sum)
      val sxx = cols(ix).map(v => v * v).sum
      val syy = cols(iy).map(v => v * v).sum
      val sxy = cols(ix).zip(cols(iy)).map { case (a, b) => a * b }.sum
      val expected = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      // decimal(38,0)→double happens at a different point than
      // BigInt→double here; 1e-6 on a [-1,1] scale pins the replay while
      // the DuckDB twin (HUGEINT, same association) pins bit-exactness
      assert(math.abs(corr - expected) < 1e-6, s"corr($x,$y)")
      assert(math.abs(corr) <= 1.0 + 1e-12)
    }
  }

  test("ann_ivf_sq: scores are the flat SQ kernel's, ranks are a per-query desc top-k") {
    val ivf = QuantOps.annIvfSq(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ivf.nonEmpty)
    // flat reference: decoded-corpus exact ranking over ALL candidates
    val flat = QuantOps.annSqTopk(s, sf, k = Int.MaxValue - 1)
    val flatMap = flat.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (q, n, cos, _) =>
      assert(math.abs(flatMap((q, n)) - cos) < 1e-12,
        s"IVF-SQ score for ($q,$n) must equal the flat SQ kernel")
    }
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      val sorted = rows.sortBy(_._4).map(_._3)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b },
        s"desc order for $q")
    }
  }
}
