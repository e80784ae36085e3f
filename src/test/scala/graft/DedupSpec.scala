package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, SimilarityOps}

class DedupSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  /** 40 docs + exact dup of doc 0 + a near-dup of doc 1 (one word changed). */
  private lazy val docsWithDups = {
    val base = Tables.documents(s, sf).filter(col("doc_id") < 40)
      .select("doc_id", "text")
    val exact = base.filter(col("doc_id") === 0)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val near = base.filter(col("doc_id") === 1)
      .select((col("doc_id") + 2000).as("doc_id"),
        concat(col("text"), lit(" changed")).as("text"))
    base.union(exact).union(near)
  }

  test("dedup_exact keeps the min doc_id per hash") {
    val out = DedupOps.dedupExact(s, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_dups") >= 1))
    // min-id semantics on a frame with known dups
    val dup = docsWithDups.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1).collect()
    assert(dup.exists(_.getAs[Long]("keep_id") == 0L))
  }

  test("minhash LSH surfaces exact and near duplicates as candidates") {
    val pairs = DedupOps.minhashCandidates(docsWithDups).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.contains((0L, 1000L)), s"exact dup missed: ${pairs.take(20).mkString(",")}")
    assert(pairs.contains((1L, 2001L)), s"near dup missed: ${pairs.take(20).mkString(",")}")
  }

  test("simhash: identical docs at hamming 0, near-dups close") {
    val pairs = DedupOps.simhashPairs(docsWithDups, maxHamming = 16).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1000L)
    assert(exact.exists(_._3 == 0L), s"exact dup not hamming-0: $exact")
  }

  test("ngram jaccard: dup pair scores 1.0, output within threshold") {
    val out = DedupOps.dedupNgramJaccard(s, sf).collect()
    out.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0 + 1e-12)
    }
  }

  test("ngram jaccard: hot-shingle df cap bounds boilerplate fan-out") {
    import s.implicits._
    // 30 docs sharing a 5-word boilerplate prefix (3 shingles at df=30) +
    // unique 10-word tails — the shape where an uncapped inverted index
    // emits k²/2 spurious candidate pairs from pure boilerplate
    val docs = (1 to 30).map { i =>
      (i.toLong, "the quick brown fox jumps " +
        (1 to 10).map(j => s"u${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val uncapped = DedupOps.ngramJaccardPairs(docs, threshold = 0.01,
      maxShingleDf = Int.MaxValue).count()
    assert(uncapped == 30L * 29 / 2, s"every pair shares boilerplate: $uncapped")
    val capped = DedupOps.ngramJaccardPairs(docs, threshold = 0.01,
      maxShingleDf = 10).count()
    assert(capped == 0, s"df cap must drop boilerplate-only pairs, got $capped")
    // the cap never fires on the sf corpus (max df ≪ 1024), so the
    // oracle-compared default output is unchanged by the capping
    val deflt = DedupOps.dedupNgramJaccard(s, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val nocap = DedupOps.ngramJaccardPairs(Tables.documents(s, sf), 0.5,
      Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(deflt == nocap, "cap must be a no-op on the test corpus")
  }

  test("containment: catches subset duplication symmetric Jaccard misses") {
    import s.implicits._
    // doc 1 (12 words) is quoted WHOLE inside doc 2 (112 words): its 10
    // shingles are all among doc 2's 110 → containment 1.0, but Jaccard
    // 10/110 ≈ 0.09 — far below any dedup threshold
    val short = (1 to 12).map(i => s"s$i").mkString(" ")
    val long = short + " " + (1 to 100).map(i => s"t$i").mkString(" ")
    val third = (1 to 12).map(i => s"x$i").mkString(" ") // unrelated
    val docs = Seq((1L, short), (2L, long), (3L, third)).toDF("doc_id", "text")
    val jac = DedupOps.ngramJaccardPairs(docs, threshold = 0.5).collect()
    assert(jac.isEmpty, "symmetric Jaccard must miss the contained pair")
    val con = DedupOps.containmentPairs(docs, threshold = 0.8).collect()
    assert(con.length == 1)
    val r = con.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("contained_doc") == 1L) // the smaller-set side
    assert(math.abs(r.getAs[Double]("containment") - 1.0) < 1e-12)
    s.catalog.clearCache()
  }

  test("containment on sf data: scores recompute from raw shingle sets") {
    val out = DedupOps.dedupContainment(s, sf).collect()
    s.catalog.clearCache()
    val docs = Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    // df cap: count each shingle's doc frequency, drop hot ones — mirror
    val df = scala.collection.mutable.Map.empty[String, Int]
    docs.values.foreach(t => shingleSet(t).foreach(sh => df(sh) = df.getOrElse(sh, 0) + 1))
    val kept = docs.map { case (id, t) =>
      id -> shingleSet(t).filter(sh => df(sh) <= DedupOps.MaxShingleDf) }
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (kept(a), kept(b))
      val expected = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
      assert(math.abs(r.getAs[Double]("containment") - expected) < 1e-12, s"pair ($a,$b)")
      assert(r.getAs[Long]("contained_doc") ==
        (if (sa.size <= sb.size) a else b), s"pair ($a,$b) contained side")
      assert(expected >= DedupOps.ContainmentThreshold)
    }
  }

  test("embedding near-dup pairs have valid cosine") {
    val out = DedupOps.dedupEmbedding(s, sf).collect()
    assert(out.nonEmpty, "no pairs at the default threshold — miscalibrated")
    out.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0 + 1e-9))
  }

  test("ann brute-force topk: k per query, descending, self excluded") {
    val out = SimilarityOps.annCosineTopK(s, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(!rs.exists(_.getAs[Long]("n_id") == q))
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b - 1e-12 })
    }
  }

  test("minhash-verified pairs are exact-Jaccard-correct (subset of the full exact output)") {
    val full = DedupOps.dedupNgramJaccard(s, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val verified = DedupOps.dedupMinhashVerified(s, sf).collect()
    verified.foreach { r =>
      val pair = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(full.contains(pair), s"verified pair $pair not in the exact output")
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("ann IVF: k-means cells give high recall vs brute force at nprobe=2") {
    val brute = SimilarityOps.annCosineTopK(s, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = SimilarityOps.annIvf(s, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(ivf.nonEmpty)
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.2, f"IVF recall vs brute force too low: $recall%.2f")
  }

  test("native kernels: edge inputs (empty, short, repeated-space strings)") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(graft.functions.SimHash64.compute(u("")) == 0L, "no tokens → zero signature")
    assert(graft.functions.SimHash64.compute(u("   ")) == 0L)
    assert(graft.functions.SimHash64.compute(u("a  b")) ==
      graft.functions.SimHash64.compute(u("a b")), "empty tokens carry no votes")
    assert(graft.functions.MinHash32.compute(u("a b")) == null, "<3 tokens → null")
    val one = graft.functions.MinHash32.compute(u("a b c"))
    assert(one != null && one.numElements() == 32)
    // one shingle → every slot is that shingle's slot hash (no other min)
    val again = graft.functions.MinHash32.compute(u("a b c"))
    assert((0 until 32).forall(i => one.getLong(i) == again.getLong(i)))
  }

  test("native MinHash32 matches the exploded min-aggregate formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, sf)
    // the original formulation: shingle explode → hash → K min aggregates
    val sh = DedupOps.hashedShingles(docs)
    val sigCols = (0 until DedupOps.MinhashK).map { i =>
      min(xxhash64(lit(i), col("hb"))).as(s"mh_$i")
    }
    val want = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to DedupOps.MinhashK).map(r.getLong).toVector)
      .toMap
    val got = DedupOps.minhashSignatures(docs)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got == want, "native kernel must reproduce the aggregate mins bit-for-bit")
  }

  test("native SimHash64 matches the exploded vote-aggregate formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, sf)
    // the original formulation: explode → xxhash64 per token → 64 vote sums
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0) // kernel skips empty tokens
      .withColumn("th", xxhash64(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v_$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val want = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = DedupOps.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "native kernel must reproduce the aggregate math bit-for-bit")
  }

  test("connected components: chain, triangle, and disjoint pairs label correctly") {
    import s.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
  }

  test("connected components: a 100-node path converges (pointer jumping beats diameter)") {
    import s.implicits._
    // diameter 99 >> maxIter 20: pure one-hop min-label propagation would
    // raise; path halving needs ~log2(99) + c rounds
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(edges).collect()
    assert(labels.length == 100 && labels.forall(_.getAs[Long]("label") == 0L))
  }

  test("dedup_clusters: every doc labeled, pairs co-clustered, keepers are minima") {
    val clusters = DedupOps.dedupClusters(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(clusters.size == Tables.documents(s, sf).count())
    clusters.foreach { case (d, c) => assert(c <= d, "cluster id must be the min member") }
    val pairs = DedupOps.dedupMinhashVerified(s, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(clusters(r.getAs[Long]("doc_a")) == clusters(r.getAs[Long]("doc_b")),
        "near-dup pair must share a cluster")
    }
  }

  test("semantic_clusters: labels close over the bucketed embedding near-dup graph") {
    val out = DedupOps.semanticClusters(s, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    s.catalog.clearCache()
    // the key's OWN edge source (bucketed LSH pairs) must co-cluster —
    // at the organic τ=0.35 search regime LSH recall vs brute is sub-1
    // by design, so brute pairs are NOT the contract here (the planted
    // regime test below pins brute equality where dedup actually runs)
    val pairs = DedupOps.dedupEmbeddingLsh(s, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    s.catalog.clearCache()
    assert(out.nonEmpty && pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(out(a) == out(b), s"pair ($a,$b) split across clusters") }
    val adjacent = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.foreach { case (id, c) =>
      if (!adjacent(id)) assert(c == id, s"isolated $id mislabeled $c")
      else assert(out(c) == c, s"label $c of $id is not a cluster root")
    }
  }

  test("semantic_clusters: bucketed == brute clusters in the planted near-dup regime") {
    // the dedup operating regime: jittered cos≈0.999 twins planted on an
    // organic corpus (RecallSpec's construction), τ=0.9 — here the LSH
    // prefilter reproduces the exact pair set, so the keyed composition
    // and the quadratic baseline must agree cluster-for-cluster
    val base = Tables.embeddings(s, sf).select("vec_id", "embedding")
    val dups = base.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * (lit(1.0f) + lit(0.02f) * sin(i.cast("double")).cast("float")))
            .cast("float")).as("embedding"))
    val corpus = base.unionByName(dups)
    val lsh = DedupOps.semanticClustersFrom(corpus, threshold = 0.9).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    s.catalog.clearCache()
    val brute = DedupOps.semanticClustersBrute(corpus, threshold = 0.9).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    s.catalog.clearCache()
    assert(lsh.nonEmpty && lsh.size == brute.size)
    // non-trivial: the planted twins must actually cluster with their source
    // sf0.001 embeddings = 500 vectors → ~13 planted twins at %40
    assert(lsh.count { case (id, c) => id != c } >= 10,
      "expected ≥10 planted twins clustered to their originals")
    assert(lsh == brute, {
      val diff = lsh.collect { case (id, c) if brute(id) != c => (id, c, brute(id)) }.take(5)
      s"bucketed vs brute cluster mismatch (id, lsh, brute): $diff"
    })
  }

  test("ann LSH: results are a subset-quality approximation of brute force") {
    val brute = SimilarityOps.annCosineTopK(s, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Double]("cos_sim")))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).max }
    val lsh = SimilarityOps.annLsh(s, sf).collect()
    assert(lsh.nonEmpty, "LSH returned nothing — bucket width miscalibrated")
    lsh.foreach { r =>
      val best = brute(r.getAs[Long]("q_id"))
      assert(r.getAs[Double]("cos_sim") <= best + 1e-12,
        "LSH found a better neighbor than brute force (impossible)")
    }
  }
}
