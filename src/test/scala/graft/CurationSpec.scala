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

  test("curation job lands the best-quality PASSING copy per near-dup cluster") {
    import graft.operators.DedupOps
    val base = java.nio.file.Files.createTempDirectory("graft_cur").toString
    val path = Jobs.runCurationJob(s, sf, base, "2024-02-01")
    assert(path.endsWith("dt=2024-02-01"))
    val landed = s.read.parquet(path).collect()
    assert(landed.nonEmpty)
    // one survivor per cluster
    val byCluster = landed.map(_.getAs[Long]("cluster_id"))
    assert(byCluster.distinct.length == byCluster.length)
    // every landed row passes both gates
    val gateOk = s.read.parquet(path)
      .withColumn("q", TextOps.qualityExpr(col("text")))
      .withColumn("p", TextOps.predLangExpr(col("text")))
      .filter(col("q") >= 0.5 && col("p") === col("lang")).count()
    assert(gateOk == landed.length.toLong)
    // the landed member is the MAX-LOGIT gate-passing member of its
    // cluster (ties → min doc_id), and every cluster with at least one
    // passer is represented — recomputed from the verdict frame
    val passers = Tables.documents(s, sf)
      .withColumn("q", TextOps.qualityExpr(col("text")))
      .withColumn("p", TextOps.predLangExpr(col("text")))
      .filter(col("q") >= 0.5 && col("p") === col("lang"))
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    val verdicts = DedupOps.dedupSurvivors(s, sf).collect()
    s.catalog.clearCache()
    val bestPasser = verdicts
      .filter(r => passers(r.getAs[Long]("doc_id")))
      .groupBy(_.getAs[Long]("cluster_id"))
      .map { case (c, rows) =>
        c -> rows.map(r => (-r.getAs[Long]("logit_e12"), r.getAs[Long]("doc_id"))).min._2
      }
    assert(landed.length == bestPasser.size,
      "every cluster with a passing member must land exactly one row")
    landed.foreach { r =>
      assert(bestPasser(r.getAs[Long]("cluster_id")) == r.getAs[Long]("doc_id"),
        s"cluster ${r.getAs[Long]("cluster_id")} landed a non-optimal member")
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
