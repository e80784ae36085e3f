package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("graft functions are SQL-callable via SparkSessionExtensions") {
    // Force a NEW session (sharing the JVM's SparkContext) so the
    // extension registration path actually runs — getOrCreate would
    // silently reuse an existing session and skip extensions.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val fp = s.sql("SELECT graft_rolling_hash64('a b c') AS fp").head().getLong(0)
      val want = "a b c".getBytes("UTF-8")
        .foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xffL)) * 0x100000001b3L)
      assert(fp == want)
      val d = s.sql(
        "SELECT graft_dot_e12(array(cast(0.5 as float)), array(cast(2.0 as float))) AS d")
        .head().getLong(0)
      assert(d == 1000000000000L)
    } finally {
      // restore the shared test session as default; do NOT stop the context
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
