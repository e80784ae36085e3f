package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PriceFunctions

/** Property test (scalacheck generators, plain scalatest driver): parse is
  * the left-inverse of format wherever the reference's heuristic is
  * well-defined — and faithfully "wrong" where the reference is (dot-
  * decimal strings whose digit-stripped reading lands inside the sanity
  * window take the thousands-dot branch, exactly as the reference does). */
class PricePropertySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  test("parse . format recovers the amount wherever the heuristic is well-defined") {
    import s.implicits._
    val gen = for {
      rate <- Gen.oneOf(1.0, 1.5, 2.5, 4.0)
      usdC <- Gen.choose(11L, 9900L) // usd cents in (0.11, 99)
      fmt <- Gen.choose(0, 2)
    } yield (math.round(usdC * rate), rate, fmt)
    val sample = Gen.listOfN(300, gen).sample.get

    val rows = sample.toDF("ct", "rate", "fmt")
      .withColumn("price_str", PriceFunctions.formatPriceString(col("ct"), col("fmt")))
      .withColumn("usd", PriceFunctions.parsePriceToUsd(col("price_str"), col("rate")))
      .collect()
    var checked = 0
    rows.foreach { r =>
      val ct = r.getAs[Long]("ct"); val rate = r.getAs[Double]("rate")
      val fmt = r.getAs[Int]("fmt")
      val want = ct / 100.0 / rate
      val got = r.getAs[Double]("usd")
      val inWindow = want > 0.101 && want < 99.9
      // fmt 1/2 are dot-decimal: well-defined only when the digit-stripped
      // reading (ct/rate) is clearly outside the window, forcing re-parse
      val wellDefined = inWindow && (fmt == 0 || ct.toDouble / rate > 100.5)
      if (wellDefined) {
        checked += 1
        assert(math.abs(got - want) < 1e-9,
          s"ct=$ct rate=$rate fmt=$fmt str=${r.getAs[String]("price_str")}: got $got want $want")
      }
    }
    assert(checked > 100, s"property exercised too few cases: $checked")
  }
}
