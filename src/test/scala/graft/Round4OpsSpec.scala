package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CoreOps, CurationOps, TextOps}

/** Semantic contracts of the round-4 operators — properties the DuckDB
  * oracle's value-hash can't state (it only proves cross-engine equality,
  * not that the semantics are the intended ones). */
class Round4OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("scd2_history: versioned runs partition each user's timeline") {
    val h = CoreOps.scd2History(s, sf)
    // adjacent versions chain: valid_to of version v == valid_from of v+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val chained = h.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull)
    assert(chained.filter(col("valid_to_us") =!= col("next_from")).count() == 0,
      "valid_to must equal the next version's valid_from")
    // no run repeats the previous state (true compaction)
    val repeat = h.withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNotNull && col("prev_state") === col("state"))
    assert(repeat.count() == 0, "consecutive versions must change state")
    // exactly one open (current) version per user
    val cur = h.groupBy("user_id").agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
    assert(cur.filter(col("n") =!= 1).count() == 0)
  }

  test("gap_fill: dense calendar, zero-filled, totals preserved") {
    val g = CoreOps.gapFill(s, sf).cache()
    val o = Tables.orders(s, sf)
    val nPrio = o.select("o_orderpriority").distinct().count()
    val span = o.agg((datediff(to_date(max(col("o_orderdate"))),
      to_date(min(col("o_orderdate")))) + 1).as("days")).head.getAs[Int]("days")
    assert(g.count() == nPrio * span, "spine must be days x priorities, no gaps")
    val total = g.agg(sum("n_orders")).head.getLong(0)
    assert(total == o.count(), "zero-filling must not change order totals")
    assert(g.filter(col("n_orders") === 0).count() > 0, "sf data has gaps to fill")
    g.unpersist()
  }

  test("quantile_buckets: partition of the corpus into ordered ranges") {
    val b = CoreOps.quantileBuckets(s, sf).collect()
    assert(b.map(_.getAs[Long]("n_docs")).sum == Tables.documents(s, sf).count())
    // ranges ordered: bucket k's max <= bucket k+1's min (ties allowed on
    // repeated values; boundaries are interpolated so strict overlap is a bug)
    b.sortBy(_.getAs[Long]("bucket")).sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_chars") <= hi.getAs[Long]("min_chars"),
          s"bucket ranges overlap: $lo vs $hi")
      case _ =>
    }
  }

  test("ngram_counts: document frequency bounds total frequency") {
    val n = TextOps.ngramCounts(s, sf).collect()
    assert(n.nonEmpty && n.length <= 100)
    n.foreach { r =>
      assert(r.getAs[Long]("n_total") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_docs") >= 1)
      assert(r.getAs[String]("ngram").split(" ").length == 2)
    }
    // descending by n_total
    assert(n.map(_.getAs[Long]("n_total")).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
  }

  test("doc_chunk: chunks tile the document at the stride") {
    val docs = Tables.documents(s, sf).select(col("doc_id"), length(col("text")).as("len"))
    val counts = TextOps.docChunk(s, sf).groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), max("chunk_len").as("max_len"))
    val joined = counts.join(docs, "doc_id")
    // n_chunks == floor((len-1)/stride)+1 for len>=1
    val bad = joined.filter(col("len") >= 1 &&
      col("n_chunks") =!= (floor((col("len") - 1) / TextOps.ChunkStride) + 1))
    assert(bad.count() == 0, "chunk count must follow the stride formula")
    assert(joined.filter(col("max_len") > TextOps.ChunkSize).count() == 0)
    // first chunk is the document prefix
    val first = TextOps.docChunk(s, sf).filter(col("chunk_id") === 0)
      .join(Tables.documents(s, sf), "doc_id")
      .filter(col("chunk") =!= substring(col("text"), 1, TextOps.ChunkSize))
    assert(first.count() == 0)
  }

  test("decontaminate: planted eval overlap flagged, clean doc not; eval side broadcasts") {
    import s.implicits._
    val leak = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, leak + " extra words here", "src1"),            // contaminated
      (2L, "completely different words in this one doc", "src1"), // clean
      (3L, leak, "src0"))                                  // the benchmark
      .toDF("doc_id", "text", "source")
    val out = CurationOps.decontaminateDocs(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(out.head.getAs[Long]("n_shared") >= 3)
    assert(out.head.getAs[Long]("n_eval_docs") == 1L)
    // scale shape: eval posting list must be the broadcast side
    val plan = CurationOps.decontaminate(s, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe, got:\n$plan")
  }

  test("retention: day-0 cell equals cohort size; actives never exceed it") {
    val r = CoreOps.retention(s, sf).cache()
    // every cohort has a day-0 row (the users' own first day)
    val cohorts = r.filter(col("day_offset") === 0)
    assert(cohorts.count() == r.select("cohort").distinct().count())
    // no later day can retain more users than day 0 of the same cohort
    val d0 = cohorts.select(col("cohort"), col("n_active").as("n0"))
    assert(r.join(d0, "cohort").filter(col("n_active") > col("n0")).count() == 0)
    // total day-0 users == total distinct users
    val users = Tables.eventsMicros(s, sf).select("user_id").distinct().count()
    assert(cohorts.agg(sum("n_active")).head.getLong(0) == users)
    r.unpersist()
  }

  test("winnowing: a shared run of >= w+k-1 tokens shares a fingerprint") {
    import s.implicits._
    val leak = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val docs = Seq(
      (1L, s"one two three $leak four five six"),
      (2L, s"$leak seven eight nine ten eleven"),
      (3L, "totally unrelated words that never overlap with anything else"))
      .toDF("doc_id", "text")
    val fp = TextOps.winnowDocs(docs).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.map(_.getAs[Long]("fp")).toSet)
    assert((fp(1L) & fp(2L)).nonEmpty, "shared 6-token run must share a fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty, "unrelated docs must not collide")
    // compression: strictly fewer fingerprints than grams
    val grams1 = docs.filter($"doc_id" === 1L)
      .select(explode(graft.operators.DedupOps.wordGrams(col("text"), TextOps.WinnowK)))
      .count()
    assert(fp(1L).size < grams1)
  }

  test("sessionize_stats: session totals cover every event; durations fit the gap rule") {
    val stats = CoreOps.sessionizeStats(s, sf).cache()
    val events = Tables.events(s, sf).count()
    assert(stats.agg(sum("n_events")).head.getLong(0) == events,
      "every event belongs to exactly one session")
    // a session's span is bounded by (n_events-1) x the 30-min gap
    assert(stats.filter(
      col("duration_us") > (col("n_events") - 1) * lit(1800L * 1000000L)).count() == 0)
    assert(stats.filter(col("duration_us") < 0).count() == 0)
    stats.unpersist()
  }

  test("dataset_split: deterministic, exhaustive, growth-stable eval set") {
    val a = CurationOps.datasetSplit(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = CurationOps.datasetSplit(s, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a == b, "split must be a pure function of (doc_id, seed)")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // growth stability: the sf0.001 corpus is a prefix of larger corpora in
    // id space — its docs' splits must not depend on corpus size, so any
    // subset keeps identical assignments (pure per-row function, no stats)
    val n = a.size
    val third = a.keys.toSeq.sorted.take(n / 3).toSet
    val sub = CurationOps.datasetSplit(s, sf).filter(col("doc_id").isInCollection(third))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(sub == a.view.filterKeys(third).toMap)
    // rough rate sanity at small n: train dominates
    assert(a.values.count(_ == "train") > n * 9 / 10)
  }

  test("pack_sequences: in-shard layout is gapless and within budget") {
    val p = CurationOps.packSequences(s, sf).cache()
    assert(p.filter(col("seq_offset") >= CurationOps.PackBudget).count() == 0)
    assert(p.filter(col("n_splits") < 1).count() == 0)
    // gapless: each doc starts exactly where the previous doc in its
    // shard ended (offset arithmetic reconstructs the running sum)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")
    val cum = p.withColumn("start", col("seq_id") * CurationOps.PackBudget + col("seq_offset"))
      .withColumn("prev_end", lag(col("start") + col("n_tokens"), 1).over(w))
    assert(cum.filter(col("prev_end").isNotNull && col("start") =!= col("prev_end"))
      .count() == 0, "packing must be gapless concat-and-split")
    p.unpersist()
  }
}
