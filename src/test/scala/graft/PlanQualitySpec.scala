package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-checks over every registered query's physical plan: the
  * properties that decide whether a plan survives a 100× scale-up. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(s, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(1200)}")
    }
  }

  test("every query analyzes and optimizes without error") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val qe = fn(s, sf).queryExecution
      assert(qe.optimizedPlan != null, s"$name failed to optimize")
    }
  }

  test("oracle SQL exists exactly for the SQL-expressible queries") {
    val rowsOnly = Set("parquet_sink", "approx_distinct", "approx_quantiles",
      "dedup_minhash_lsh", "dedup_minhash_verified", "dedup_simhash", "dedup_clusters",
      "dedup_embedding_lsh", "ann_lsh", "ann_ivf", "text_fingerprint",
      "mm_metadata", "mm_features", "mm_frames", "stratified_sample",
      "hll_distinct", "zorder_layout", "text_winnow", "dataset_split",
      "mixture_sample")
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
    assert(qs -- os == rowsOnly, s"rows-only drift: ${(qs -- os) -- rowsOnly} / missing ${rowsOnly -- (qs -- os)}")
  }
}
