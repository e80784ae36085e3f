package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, DedupOps, TextOps}

/** Round-7 operators: fractional decontamination, the eval-side
  * contamination audit, bigram corpus familiarity, and fuzzy incremental
  * dedup admission. Fixtures are hand-computable; the sf data adds
  * shape/sanity coverage on top of the oracle. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("decontaminate_overlap: fraction is length-invariant, short docs kept") {
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "src0"),  // eval: shingles {abc,bcd,cde,def}
      (10L, "a b c d e f", "src1"), // full copy -> 4/4 = 1.0, dropped
      (11L, "a b c x y z", "src1"), // shares only "a b c" -> 1/4 = 0.25
      (12L, "p q r s", "src1"),     // disjoint -> 0.0
      (13L, "hi there", "src1")     // < 3 words: no shingles, kept
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.decontaminateOverlapDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L), "every train doc reported, eval absent")
    assert(out(10L) == ((4L, 4L, 1.0, false)), "full copy dropped at tau=0.5")
    assert(out(11L) == ((4L, 1L, 0.25, true)), "one shared shingle out of four")
    assert(out(12L) == ((2L, 0L, 0.0, true)))
    assert(out(13L) == ((0L, 0L, 0.0, true)), "sub-shingle doc kept")
  }

  test("contamination_report: eval-side fractions and max train df recompute by hand") {
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "src0"),  // eval: 4 shingles, all in train
      (2L, "u v w x", "src0"),      // eval: 2 shingles, none in train
      (10L, "a b c d e f", "src1"), // carries all 4 of e1's shingles
      (11L, "a b c x y z", "src1")  // carries "a b c" again -> df 2
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.contaminationReportDocs(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out(1L) == ((4L, 4L, 1.0, 2L)),
      "fully leaked eval doc; 'a b c' sits in two train docs")
    assert(out(2L) == ((2L, 0L, 0.0, 0L)), "clean eval doc")
  }

  test("decontamination family on sf data: fractions bounded, verdicts consistent, totals reconcile") {
    val docs = Tables.documents(s, sf)
    val trainN = docs.filter(col("source") =!= CurationOps.EvalSource).count()
    val evalShingled = docs.filter(col("source") === CurationOps.EvalSource)
      .filter(size(split(col("text"), " ")) >= 3).count()
    val ov = CurationOps.decontaminateOverlap(s, sf)
    assert(ov.count() == trainN, "one verdict per train doc")
    assert(ov.filter(col("overlap_frac") < 0 || col("overlap_frac") > 1).count() == 0)
    assert(ov.filter(col("n_shared") > col("n_shingles")).count() == 0)
    assert(ov.filter(col("kept") =!= (col("overlap_frac") < CurationOps.DecontOverlapTau))
      .count() == 0, "kept must be exactly frac < tau")
    val rep = CurationOps.contaminationReport(s, sf)
    assert(rep.count() == evalShingled, "one audit row per shingled eval doc")
    assert(rep.filter(col("n_contaminated") > col("n_shingles")).count() == 0)
    assert(rep.filter(col("contamination_frac") < 0 || col("contamination_frac") > 1)
      .count() == 0)
    assert(rep.filter(col("n_contaminated") === 0 && col("max_train_df") =!= 0)
      .count() == 0, "clean docs carry zero max_train_df")
    assert(rep.filter(col("n_contaminated") > 0 && col("max_train_df") < 1)
      .count() == 0, "contaminated docs name a positive train df")
    s.catalog.clearCache()
  }

  test("text_familiarity: bigram df stats recompute by hand; sub-bigram docs zeroed") {
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b"), // distinct bigrams {a b, b a}
      (2L, "a b c"),   // {a b, b c}
      (3L, "z")        // no bigrams
    ).toDF("doc_id", "text")
    val out = TextOps.textFamiliarityDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // df: "a b" -> 2 docs, "b a" -> 1, "b c" -> 1
    assert(out(1L) == ((2L, 1L, 1.5)))
    assert(out(2L) == ((2L, 1L, 1.5)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("text_familiarity on sf data: df bounds hold and boilerplate-free docs score low") {
    val docsN = Tables.documents(s, sf).count()
    val out = TextOps.textFamiliarityDocs(Tables.documents(s, sf))
    // every df-derived stat is bounded by the corpus size
    assert(out.filter(col("avg_df") > docsN || col("min_df") > docsN).count() == 0)
    assert(out.count() == docsN, "one row per document")
    s.catalog.clearCache()
  }

  test("dedup_minhash_incremental: verdicts match a brute-force Jaccard recompute; corpus never self-pairs") {
    import s.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn every single day"
    val t2 = "completely different content about spark engines and columnar execution at warehouse scale with vectorized readers"
    val docs = Seq(
      (1L, t1, "src1"),   // corpus
      (2L, "unrelated corpus text with its own vocabulary entirely", "src1"),
      (100L, t1, "src1"), // identical to corpus doc 1
      (101L, t2, "src1"), // fresh content
      (102L, t2, "src1"), // identical to earlier batch doc 101
      (103L, "the quick brown fox but then everything else diverges wildly into other topics and words", "src1")
    ).toDF("doc_id", "text", "source")
    val split = 100L
    val out = DedupOps.dedupMinhashIncrementalFrom(docs, split, 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    // only batch docs appear — the corpus is never paired with itself
    assert(out.keySet == Set(100L, 101L, 102L, 103L))

    // brute-force exact-Jaccard recompute over (batch, corpus ∪ earlier batch)
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val all = Map(1L -> t1, 2L -> "unrelated corpus text with its own vocabulary entirely",
      100L -> t1, 101L -> t2, 102L -> t2,
      103L -> "the quick brown fox but then everything else diverges wildly into other topics and words")
    def j(a: String, b: String): Double = {
      val (x, y) = (sh(a), sh(b))
      if (x.isEmpty || y.isEmpty) 0.0
      else (x & y).size.toDouble / (x | y).size
    }
    for (b <- Seq(100L, 101L, 102L, 103L)) {
      val expCorpus = Seq(1L, 2L).exists(c => j(all(b), all(c)) >= 0.5)
      val expBatch = Seq(100L, 101L, 102L, 103L).filter(_ < b)
        .exists(o => j(all(b), all(o)) >= 0.5)
      assert(out(b)._1 == expCorpus, s"doc $b dup_of_corpus")
      assert(out(b)._2 == expBatch, s"doc $b dup_in_batch")
      assert(out(b)._3 == (!expCorpus && !expBatch), s"doc $b keep")
    }
    s.catalog.clearCache()
  }

  test("landAdmissionStream: verdicts accumulate across micro-batches; admitted docs index forward") {
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tA = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn every single day"
    val tB = "completely different content about spark engines and columnar execution at warehouse scale with vectorized readers"
    val tC = "a third body of text with yet another distinct vocabulary covering gardening tips for arid climates in summer"
    val dir = java.nio.file.Files.createTempDirectory("graft_admission").toString
    val in = MemoryStream[(Long, String)](s)
    val q = graft.streaming.EventStreams.landAdmissionStream(
      in.toDF().toDF("doc_id", "text"), dir)
    try {
      in.addData((1L, tA), (2L, tB), (3L, tA)) // 3 is an in-batch dup of 1
      q.processAllAvailable()
      in.addData((10L, tA), (11L, tC))         // 10 dups the INDEXED doc 1
      q.processAllAvailable()
      val v = s.read.parquet(s"$dir/verdicts").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("dup_of_corpus"), r.getAs[Boolean]("dup_in_batch"),
            r.getAs[Boolean]("keep")))).toMap
      assert(v(1L) == ((false, false, true)), "first copy admitted")
      assert(v(2L) == ((false, false, true)))
      assert(v(3L) == ((false, true, false)), "in-micro-batch dup of 1")
      assert(v(10L) == ((true, false, false)),
        "batch-2 copy of tA must hit the index doc 1 landed in batch 1")
      assert(v(11L) == ((false, false, true)), "fresh content admitted")
      // index contains exactly the admitted docs (rejected dups not indexed)
      val indexed = s.read.parquet(s"$dir/shingles")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 2L, 11L))
    } finally q.stop()
    s.catalog.clearCache()
  }

  test("dedup_minhash_incremental on sf data: batch-only output, verdict consistency") {
    val out = DedupOps.dedupMinhashIncremental(s, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") >= DedupOps.IncrementalSplit))
    assert(out.forall(r => r.getAs[Boolean]("keep") ==
      (!r.getAs[Boolean]("dup_of_corpus") && !r.getAs[Boolean]("dup_in_batch"))))
    s.catalog.clearCache()
  }
}
