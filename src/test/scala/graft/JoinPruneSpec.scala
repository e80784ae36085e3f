package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomPrune

class JoinPruneSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("bloom-pruned join: identical result to the plain join, probe side actually pruned") {
    val li = Tables.lineitem(s, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "k")
    // selective build side: 1% of orders
    val dim = Tables.orders(s, sf).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(dim, Seq("k"))
    val pruned = BloomPrune.bloomPrunedJoin(li, dim, "k")
    assert(pruned.count() == plain.count(), "bloom prune must not change the join result")
    // no false negatives: every surviving key set matches exactly
    val a = plain.select("k").distinct().collect().map(_.getLong(0)).toSet
    val b = pruned.select("k").distinct().collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the prefilter reduces the probe side before the shuffle (~1% + fpp)
    val bos = new java.io.ByteArrayOutputStream()
    dim.stat.bloomFilter("k", math.max(dim.count(), 1L), 0.01).writeTo(bos)
    val kept = li.filter(BloomPrune.mightContain(bos.toByteArray,
      col("k").cast("long"))).count()
    val total = li.count()
    assert(kept < total / 10,
      s"probe side not pruned: kept $kept of $total")
    // the prune is a native expression in the plan, not a UDF
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("bloom_prune_join query key: native prune in plan, equals the plain join") {
    val q = graft.operators.JoinOps.bloomPruneJoin(s, sf)
    assert(q.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "query must actually route through the bloom prune")
    val plain = Tables.lineitem(s, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
      .join(Tables.orders(s, sf).filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .select("o_orderkey", "o_orderpriority"), Seq("o_orderkey"))
      .orderBy("o_orderkey", "l_linenumber")
    assert(q.collect().toSeq == plain.collect().toSeq)
  }

  test("text_tfidf: scores match a local recomputation; top-k per doc") {
    val out = graft.operators.TextOps.textTfidf(s, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val scores = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y - 1e-12 },
        "tfidf must be non-increasing in rank")
      rows.foreach { r =>
        val tf = r.getAs[Long]("tf"); val df = r.getAs[Long]("df")
        assert(tf >= 1 && df >= 1)
        // exact double recomputation: tf * N / df with N = 500 docs
        val want = tf.toDouble * 500L / df
        assert(r.getAs[Double]("tfidf") == want, "score must be the exact ratio")
      }
    }
  }
}
