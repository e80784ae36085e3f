package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("salted join matches the plain join row-for-row and spreads the hot key") {
    val li = Tables.lineitem(s, sf).select("l_orderkey", "l_suppkey", "l_extendedprice")
      // manufacture skew: fold most supplier keys onto one hot key
      .withColumn("skey", when(col("l_suppkey") < 8, lit(0L)).otherwise(col("l_suppkey")))
    val sup = Tables.supplier(s, sf).select(col("s_suppkey").as("skey"), col("s_name"))

    val plain = li.join(sup, "skey")
    val salted = SkewJoin.saltedJoin(li, sup, "skey")
    assert(salted.count() == plain.count())
    val a = plain.groupBy("skey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("skey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "salted join changed per-key cardinalities")
    // the hot key is spread: salted plan partitions on (key, salt)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt") || plan.contains("hashpartitioning"), plan.take(800))
  }

  test("skew_join_salted query key: joins on the salt, equals the plain-join aggregate") {
    val q = graft.operators.JoinOps.skewJoinSalted(s, sf)
    assert(q.queryExecution.optimizedPlan.toString.contains("__salt"),
      "query must actually route through the salted join")
    val li = Tables.lineitem(s, sf)
    val sup = Tables.supplier(s, sf)
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5))
          .cast("double") / 100.0).as("revenue"))
      .orderBy("s_nationkey")
    assert(q.collect().toSeq == plain.collect().toSeq)
  }
}
