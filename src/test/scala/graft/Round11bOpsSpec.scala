package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CoreOps, QuantOps, RetrievalOps, SimilarityOps, TextOps}

/** Round 11 new operators: CDC merge, SQ8 scalar quantization + ADC
  * probe, MaxSim late-interaction retrieval (brute + LSH-pruned).
  * Each test recomputes the operator's semantics independently (driver-
  * side Scala over collected inputs, same double-association) — the
  * specs verify VALUES, not shapes; the DuckDB twins then pin the same
  * values cross-engine. */
class Round11bOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("merge_upsert applies latest-wins changeset: update/insert/delete/passthrough") {
    val out = CoreOps.mergeUpsert(s, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3))).toMap

    // independent recompute of the changeset from the raw tables
    val base = graft.Tables.customer(s, sf)
      .select("c_custkey", "c_name", "c_acctbal").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val latest = graft.Tables.orders(s, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"),
        col("o_orderdate").cast("string").as("od")).collect()
      .groupBy(_.getLong(0)).map { case (ck, rows) =>
        // string-cast timestamps compare chronologically (fixed-width)
        val top = rows.maxBy(r => (r.getString(5), r.getLong(1)))
        (ck, top.getString(2), top.getDouble(3), top.getString(4))
      }
    val expected = scala.collection.mutable.Map[Long, (String, Double, String)]()
    base.foreach { case (k, (n, bal)) => expected(k) = (n, bal, "unchanged") }
    latest.foreach { case (ck, status, bal, prio) =>
      // 'F' wins over urgent (op CASE order) — an urgent+'F' latest
      // order is a delete keyed at the OFFSET key, i.e. a no-op
      if (status == "F") { if (prio != "1-URGENT") expected.remove(ck) }
      else if (prio == "1-URGENT") {
        val k = ck + 1000000L
        expected(k) = (s"cust#$k", bal, "inserted")
      } else expected(ck) = base.get(ck) match {
        case Some((n, _)) => (n, bal, "updated")
        case None => (s"cust#$ck", bal, "inserted")
      }
    }
    assert(out.size === expected.size)
    assert(out === expected.toMap)
    // all three MERGE branches actually fire on this data
    val srcs = out.values.map(_._3).toSet
    assert(srcs === Set("unchanged", "updated", "inserted"))
    assert(out.size < base.size + latest.size) // deletes really removed rows
  }

  // driver-side SQ8 mirror (same double association as QuantOps)
  private def sqMirror(vecs: Seq[(Long, Array[Float])])
      : (Array[Double], Array[Double], Map[Long, Array[Double]]) = {
    val dims = QuantOps.SqDims
    val mn = Array.tabulate(dims)(i => vecs.map(_._2(i).toDouble).min)
    val mx = Array.tabulate(dims)(i => vecs.map(_._2(i).toDouble).max)
    val recon = vecs.map { case (id, v) =>
      id -> Array.tabulate(dims) { i =>
        if (mx(i) > mn(i)) {
          val q = math.floor((v(i).toDouble - mn(i)) / (mx(i) - mn(i)) * 255.0 + 0.5)
          mn(i) + q / 255.0 * (mx(i) - mn(i))
        } else mn(i)
      }
    }.toMap
    (mn, mx, recon)
  }

  test("embedding_sq8: codes in [0,255], checksums + err match a driver-side recompute") {
    val vecs = graft.Tables.embeddings(s, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val (mn, mx, _) = sqMirror(vecs)
    val expected = vecs.map { case (id, v) =>
      var cs = 0L; var cq = 0L; var err = 0L
      (0 until QuantOps.SqDims).foreach { i =>
        val (q, r) =
          if (mx(i) > mn(i)) {
            val qq = math.floor((v(i).toDouble - mn(i)) / (mx(i) - mn(i)) * 255.0 + 0.5).toLong
            (qq, mn(i) + qq.toDouble / 255.0 * (mx(i) - mn(i)))
          } else (0L, mn(i))
        assert(q >= 0L && q <= 255L)
        cs += q; cq += q * q
        err += math.floor((v(i).toDouble - r) * (v(i).toDouble - r) * 1e12 + 0.5).toLong
      }
      id -> ((cs, cq, err))
    }.toMap
    val got = QuantOps.embeddingSq8(s, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // quantization is lossy-but-bounded: max per-dim error is half a
    // level, so err_e12 < dims * (max_range/510)^2 * 1e12
    val worst = (0 until QuantOps.SqDims).map(i => (mx(i) - mn(i)) / 510.0).max
    val bound = (QuantOps.SqDims * worst * worst * 1e12 + QuantOps.SqDims).toLong
    assert(got.values.forall(_._3 <= bound))
  }

  test("ann_sq_topk ranks by exact cosine against decoded codes; recall vs exact is high") {
    val out = QuantOps.annSqTopk(s, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to 5L))
      // ranks follow cos desc with n_id tie-break
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).toSeq ===
        rows.map(_.getDouble(2)).toSeq.sorted(Ordering[Double].reverse))
    }
    // the SQ8 probe's top-5 overlaps the exact top-5 heavily: 8-bit
    // per-dim error is tiny relative to 64-dim cosine gaps
    val exact = SimilarityOps.annCosineTopK(s, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = byQ.map { case (q, rs) =>
      rs.map(_.getLong(1)).count(exact(q).contains).toDouble / 5.0
    }
    assert(recall.sum / recall.size >= 0.8, s"mean recall ${recall.sum / recall.size}")
  }

  // driver-side MaxSim mirror over the public chunk_embed frame
  private def maxsimMirror(): Map[(Long, Long), (Long, Long)] = {
    val dims = TextOps.EmbedDims
    val chunks = TextOps.chunkEmbed(s, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        Array.tabulate(dims)(i => r.getLong(2 + i)))
    }.filter { case (_, _, v) => v.map(x => x * x).sum > 0L }
    val qs = chunks.filter(_._1 % SimilarityOps.QueryModulus == 0)
    val pairs = for {
      (qd, qc, qv) <- qs
      (nd, _, nv) <- chunks if nd != qd
    } yield {
      val dot = (0 until dims).map(i => qv(i) * nv(i)).sum
      val qn = qv.map(x => x * x).sum.toDouble
      val nn = nv.map(x => x * x).sum.toDouble
      val cos = dot.toDouble / (math.sqrt(qn) * math.sqrt(nn))
      ((qd, qc, nd), math.floor(cos * 1e6 + 0.5).toLong)
    }
    pairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      .groupBy { case ((qd, _, nd), _) => (qd, nd) }
      .map { case (k, best) => k -> ((best.values.sum, best.size.toLong)) }
  }

  test("maxsim_retrieval: top-k by exact e6 MaxSim matches a driver-side recompute") {
    val scores = maxsimMirror()
    val expectTop = scores.groupBy(_._1._1).flatMap { case (qd, m) =>
      m.toSeq.map { case ((_, nd), (sc, nq)) => (nd, sc, nq) }
        .sortBy { case (nd, sc, _) => (-sc, nd) }.take(5).zipWithIndex
        .map { case ((nd, sc, nq), i) => (qd, nd) -> ((sc, nq, i + 1L)) }
    }
    val got = RetrievalOps.maxsimRetrieval(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expectTop)
  }

  test("retrieval_index_probe_maxsim: landed chunk artifact == inline; admission grows it") {
    import graft.operators.RetrievalIndexOps
    import s.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // keyed query: the landed probe is frame-identical to the inline
    // bucketed MaxSim (bucket assignment is a pure function of v)
    val landed = RetrievalIndexOps.retrievalIndexProbeMaxsim(s, sf).collect().map(key)
    s.catalog.clearCache()
    val inline = RetrievalOps.maxsimRetrievalLsh(s, sf).collect().map(key)
    s.catalog.clearCache()
    assert(landed.toSeq === inline.toSeq)

    // lifecycle on a crafted corpus: what admission lands is immediately
    // probe-visible, and a replay appends nothing
    val idx = java.nio.file.Files.createTempDirectory("graft_maxsim_idx").toString
    val corpus = Seq(
      (100L, "alpha beta gamma delta"), (1L, "alpha beta zeta"),
      (2L, "epsilon zeta eta"), (3L, "theta iota kappa"))
      .toDF("doc_id", "text")
    RetrievalIndexOps.buildRetrievalIndex(s, corpus, idx)
    s.catalog.clearCache()
    val before = RetrievalIndexOps.probeRetrievalIndexMaxsim(s, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty && before.forall(_._1 == 100L))
    val batch = Seq((10L, "alpha beta gamma"), (11L, "mu nu xi")).toDF("doc_id", "text")
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 2L)
    s.catalog.clearCache()
    val after = RetrievalIndexOps.probeRetrievalIndexMaxsim(s, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.contains((100L, 10L)),
      "the admitted near-duplicate of the query doc must be retrievable")
    // full replay: chunks (and every other artifact) already hold the batch
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 0L)
    s.catalog.clearCache()
    // a pre-chunks index admits WITHOUT inventing a partial chunks dir
    val legacy = java.nio.file.Files.createTempDirectory("graft_maxsim_legacy").toString
    RetrievalIndexOps.buildRetrievalIndex(s, corpus, legacy)
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(s"$legacy/chunks").toFile)
    s.catalog.clearCache()
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, legacy, batch) === 2L)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$legacy/chunks")))
  }

  test("maxsim_retrieval_lsh scores only bucket collisions, same kernel") {
    val brute = maxsimMirror()
    val lsh = RetrievalOps.maxsimRetrievalLsh(s, sf).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // every LSH (q_chunk, n_doc) max is over a SUBSET of the brute
      // pairs → per-doc sum uses ≤ the brute chunk count, and any doc
      // surfaced exists in the brute pair set
      assert(brute.contains(key))
      assert(r.getLong(3) <= brute(key)._2)
    }
  }
}
