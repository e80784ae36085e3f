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

  test("every query is either oracle-checked or in the rows-only contract") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val ro = SparkEntry.rowsOnly.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
    assert(qs -- os == ro,
      s"rows-only drift: undeclared ${(qs -- os) -- ro} / stale ${ro -- (qs -- os)}")
    assert((os intersect ro).isEmpty,
      s"keys claiming both an oracle and rows-only: ${os intersect ro}")
    SparkEntry.rowsOnly.foreach { case (k, (why, spec)) =>
      assert(why.nonEmpty && spec.contains("Spec"),
        s"$k rows-only entry must name a reason and a covering *Spec")
    }
  }
}
