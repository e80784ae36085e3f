package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver smoke-checks SparkEntry.entry with ITS OWN session — no
  * graft configs (no nanosAsLong, no scan repartition, default TZ). This
  * spec reproduces those conditions so entry can never silently depend on
  * a graft-session setting. */
class EntrySmokeSpec extends AnyFunSuite {

  test("entry runs under a plain vanilla session") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val plain = SparkSession.builder()
      .master("local[2]")
      .appName("graft-entry-smoke")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val rows = SparkEntry.entry(plain).count()
      assert(rows > 0, "driver smoke requires rows > 0")
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
