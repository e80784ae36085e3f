package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join strategy for repeated big⋈big joins at
  * cluster scale: both sides pre-hashed into the same bucket layout, so
  * the join runs with NO exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("bucketed orders ⋈ lineitem joins with no shuffle exchange") {
    // external table paths — the (static) warehouse dir is irrelevant
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(s, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.lineitem(s, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (only the final
    // aggregation exchanges on the group key)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")
    assert(joined.collect().map(_.getAs[Long]("n")).sum ==
      Tables.lineitem(s, sf).count())
  }
}
