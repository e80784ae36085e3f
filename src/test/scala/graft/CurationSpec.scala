package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, TextOps}

class CurationSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("corpus_filter: survivors pass every gate, keepers are group minima") {
    val out = CurationOps.corpusFilter(s, sf).collect()
    assert(out.nonEmpty, "curation must keep something at sf0.001")
    out.foreach { r =>
      assert(r.getAs[Long]("n_dups") >= 1L)
      assert(r.getAs[Double]("keep_quality") >= 0.5)
    }
    // each keeper really passes quality + language-consistency
    val keepers = out.map(_.getAs[Long]("keep_id")).toSet
    val docs = Tables.documents(s, sf)
      .withColumn("q", TextOps.qualityExpr(col("text")))
      .withColumn("p", TextOps.predLangExpr(col("text")))
      .filter(col("doc_id").isInCollection(keepers))
      .collect()
    assert(docs.length == keepers.size)
    docs.foreach { d =>
      assert(d.getAs[Double]("q") >= 0.5)
      assert(d.getAs[String]("p") == d.getAs[String]("lang"))
    }
  }

  test("corpus_filter plans a single shuffle (the dedup groupBy)") {
    val plan = CurationOps.corpusFilter(s, sf).queryExecution.executedPlan.toString
    // scoring must fuse into the scan: exchanges only for the final
    // aggregate + presentation sort (+ the test-only scan repartition)
    val hashAggExchanges = plan.linesIterator.count(l =>
      l.trim.startsWith("Exchange hashpartitioning"))
    assert(hashAggExchanges <= 1,
      s"expected at most the dedup exchange, got $hashAggExchanges:\n${plan.take(1500)}")
  }

  test("curation job lands a unique, gate-passing corpus drop") {
    val base = java.nio.file.Files.createTempDirectory("graft_cur").toString
    val path = Jobs.runCurationJob(s, sf, base, "2024-02-01")
    assert(path.endsWith("dt=2024-02-01"))
    val landed = s.read.parquet(path)
    val n = landed.count()
    assert(n > 0)
    // one row per unique kept content, and it matches the filter's keepers
    assert(landed.select(md5(col("text"))).distinct().count() == n)
    val expected = CurationOps.corpusFilter(s, sf).count()
    assert(n == expected, "landed corpus must be exactly the keeper set")
    landed.collect().foreach { r =>
      assert(r.getAs[Double]("keep_quality") >= 0.5)
      assert(r.getAs[Long]("n_dups") >= 1L)
    }
  }

  test("curriculum_stages: quartile bands recompute from the quality head; budgets conserve") {
    import org.apache.spark.sql.functions._
    import graft.operators.CurationOps
    val stages = CurationOps.curriculumStages(s, TestSpark.sf).collect()
    assert(stages.map(_.getAs[Long]("stage")).toSeq == Seq(1L, 2L, 3L, 4L))
    // logit bands are disjoint and rising — the curriculum order
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_logit_e12") <= b.getAs[Long]("min_logit_e12"),
        s"stage bands overlap: ${a.getAs[Long]("stage")} vs ${b.getAs[Long]("stage")}")
    }
    // conservation: stages partition the corpus and its tokens exactly
    val docs = Tables.documents(s, TestSpark.sf)
      .select(size(split(col("text"), " ")).cast("long").as("t")).collect()
    assert(stages.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(stages.map(_.getAs[Long]("n_tokens")).sum == docs.map(_.getLong(0)).sum)
    // quartiles balance within the tie slack of integer logits
    val n = docs.length
    stages.foreach { r =>
      val d = r.getAs[Long]("n_docs")
      assert(d > n / 8 && d < n / 2, s"degenerate stage size $d of $n")
    }
    val shares = stages.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shares - 1.0) < 1e-12)
    s.catalog.clearCache()
  }

  test("stratified_sample: deterministic, nested across rates, near target rates") {
    val a = CurationOps.stratifiedSample(s, sf).collect().map(_.getAs[Long]("doc_id")).toSet
    val b = CurationOps.stratifiedSample(s, sf).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b, "same seed must reproduce the same sample")

    val half = CurationOps.stratifiedSample(s, sf, Map("en" -> 0.25), 0.1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(half.subsetOf(a), "lower-rate sample must nest inside the higher-rate one")

    val total = Tables.documents(s, sf).filter(col("lang") === "en").count().toDouble
    val enKept = CurationOps.stratifiedSample(s, sf)
      .filter(col("lang") === "en").count().toDouble
    val rate = enKept / total
    assert(rate > 0.35 && rate < 0.65, s"en rate should be ~0.5, got $rate")
  }

  test("stratified_sample survives repartitioning unchanged") {
    val base = CurationOps.stratifiedSample(s, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val conf = "graft.scan.repartition"
    val old = s.conf.getOption(conf)
    try {
      s.conf.set(conf, "7")
      val repart = CurationOps.stratifiedSample(s, sf)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(repart == base, "hash-keyed sampling must not depend on partitioning")
    } finally old match {
      case Some(v) => s.conf.set(conf, v)
      case None => s.conf.unset(conf)
    }
  }
}
