package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchOps

/** Mergeable HLL sketches: the merge-of-partials contract that makes
  * incremental distinct maintenance sound at 100 TB. */
class SketchSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("hll_distinct: merging daily partials loses nothing vs the direct sketch") {
    val rows = SketchOps.hllDistinct(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users")
      val approx = r.getAs[Long]("approx_users")
      val merged = r.getAs[Long]("merged_users")
      assert(approx == merged,
        s"${r.getString(0)}: union of per-day sketches ($merged) must equal the " +
          s"whole-input sketch ($approx) — HLL union is register-wise max")
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: estimate $approx drifted >5% from exact $exact")
      assert(r.getAs[Long]("n_partials") >= 1)
    }
  }

  test("landed sketches merge to the direct estimate; re-landing one day is idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_sketches").toString
    SketchOps.landDistinctSketches(s, sf, out)

    val direct = SketchOps.hllDistinct(s, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val merged1 = SketchOps.mergeDistinctSketches(s, out).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    assert(merged1 == direct, s"merged-from-disk $merged1 != direct $direct")

    // a sketch row is KBs regardless of summarized volume
    val files = s.read.parquet(out)
    assert(files.count() >= direct.size)

    // late-data re-run of the NEWEST day only: dynamic partition overwrite
    // must replace that day and leave the estimate unchanged
    val maxDt = files.agg(max(col("dt"))).head().get(0).toString
    SketchOps.dailySketches(s, sf).filter(col("dt") === lit(maxDt)).write
      .partitionBy("dt")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(out)
    val merged2 = SketchOps.mergeDistinctSketches(s, out).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    assert(merged2 == merged1, "idempotent re-land of one day changed the merge")
  }
}
