package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

/** Z-order layout: every output file must get a small bounding box in ALL
  * clustered dimensions, so stats-based readers prune on any of them —
  * vs a single-column sort, which prunes on that column only. */
class LayoutSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("zValue interleaves bits (Morton order basics)") {
    import s.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(LayoutOps.zValue(Seq(col("x"), col("y")), bits = 3).as("z"))
    // x is dim 0 (even bits), y dim 1 (odd bits):
    // (3,5) = x bits 011, y bits 101 -> z = 1_0_1 interleaved = 100111 = 39
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("z-ordered files bound BOTH dimensions; sorted layout only one") {
    val ev = Tables.eventsUs(s, sf)
      .select(col("user_id"), col("us"), col("event_type"))
    val files = 8
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val tDir = java.nio.file.Files.createTempDirectory("graft_t").toString
    LayoutOps.zorderWrite(ev, Seq("user_id", "us"), zDir, files)
    // the status quo: time-sorted landing (prunes on us, never on user_id)
    ev.repartitionByRange(files, col("us")).sortWithinPartitions("us")
      .write.mode("overwrite").parquet(tDir)

    // At equal file counts both layouts give boxes of comparable AREA
    // (~1/files); z-order's win is BALANCE — each dimension's span shrinks
    // to ~1/√files instead of (1, 1/files), so predicates on EITHER
    // dimension prune. Assert per-dimension mean span fractions.
    def dimCoverage(dir: String, dim: String): Double = {
      val b = LayoutOps.fileBounds(s.read.parquet(dir), Seq(dim)).collect()
      val gmn = b.map(_.getAs[Long](s"mn_$dim")).min
      val gmx = b.map(_.getAs[Long](s"mx_$dim")).max
      b.map(r => (r.getAs[Long](s"mx_$dim") - r.getAs[Long](s"mn_$dim")).toDouble /
        math.max(1L, gmx - gmn)).sum / b.length
    }
    val zUser = dimCoverage(zDir, "user_id"); val tUser = dimCoverage(tDir, "user_id")
    val zUs = dimCoverage(zDir, "us"); val tUs = dimCoverage(tDir, "us")
    // sorted layout: each file spans ~100% of user_id; z must clearly shrink it
    assert(zUser < tUser * 0.7,
      f"z user_id span $zUser%.3f not materially below sorted $tUser%.3f")
    // ...without giving the time dimension away entirely (still a real box)
    assert(zUs < 0.8, f"z files span $zUs%.3f of the time range — no time locality")

    // concrete pruning: a user-range predicate must touch fewer z files
    val bz = LayoutOps.fileBounds(s.read.parquet(zDir), Seq("user_id")).collect()
    val bt = LayoutOps.fileBounds(s.read.parquet(tDir), Seq("user_id")).collect()
    val gmax = bz.map(_.getAs[Long]("mx_user_id")).max
    val (lo, hi) = (gmax / 2, gmax / 2 + gmax / 16)
    def touched(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(r => r.getAs[Long]("mn_user_id") <= hi && r.getAs[Long]("mx_user_id") >= lo)
    assert(touched(bz) < touched(bt),
      s"user-range predicate: z-order touched ${touched(bz)}/${bz.length} files, " +
        s"sorted ${touched(bt)}/${bt.length} — expected fewer for z")

    // row fidelity: layout changes nothing about the data
    assert(s.read.parquet(zDir).count() == ev.count())
  }

  test("maintenance chain: z-order layout survives compaction; plain repartition would not") {
    val ev = Tables.eventsUs(s, sf)
      .select(col("user_id"), col("us"), col("event_type"))
    val base = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val dt = "2024-02-01"
    LayoutOps.zorderWrite(ev, Seq("user_id", "us"), s"$base/dt=$dt", 8)

    def bytes(dir: String): Long = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally st.close()
    }
    def midTouchedFrac(dir: String): Double = {
      val b = LayoutOps.fileBounds(s.read.parquet(dir), Seq("user_id")).collect()
      val lo0 = b.map(_.getAs[Long]("mn_user_id")).min
      val hi0 = b.map(_.getAs[Long]("mx_user_id")).max
      val (lo, hi) = (lo0 + (hi0 - lo0) / 2, lo0 + (hi0 - lo0) / 2 + (hi0 - lo0) / 16)
      b.count(r => r.getAs[Long]("mn_user_id") <= hi &&
        r.getAs[Long]("mx_user_id") >= lo).toDouble / b.length
    }
    val fracBefore = midTouchedFrac(s"$base/dt=$dt")
    assert(fracBefore < 0.9, "z-ordered landing must prune the mid-range probe")

    // keep the file count stable (target = total/8 + 1 → ceil gives 8):
    // at equal counts "pruning preserved" is apples-to-apples
    val target = bytes(s"$base/dt=$dt") / 8 + 1
    val report = Jobs.runMaintenanceJob(s, base, dt, Seq("user_id", "us"), target)
      .collect().map(r => r.getAs[String]("rule") ->
        ((r.getAs[Boolean]("pass"), r.getAs[Long]("violations")))).toMap
    assert(report.keySet ==
      Set("rows_preserved", "layout_key_notnull", "pruning_preserved"))
    report.foreach { case (rule, (pass, v)) =>
      assert(pass && v == 0L, s"maintenance gate rule $rule failed with $v violations")
    }
    val fracAfter = midTouchedFrac(s"$base/dt=$dt")
    assert(fracAfter <= fracBefore + 1.0 / 8 + 1e-9,
      f"pruning degraded: $fracBefore%.3f -> $fracAfter%.3f")
    assert(s.read.parquet(s"$base/dt=$dt").count() == ev.count())

    // CONTRAST: a plain (layout-less) compaction of the same landing
    // round-robins rows — every file's box widens to the full key range
    // and the probe touches (nearly) everything. This is the regression
    // pruning_preserved exists to catch.
    val base2 = java.nio.file.Files.createTempDirectory("graft_maint2").toString
    LayoutOps.zorderWrite(ev, Seq("user_id", "us"), s"$base2/dt=$dt", 8)
    Jobs.compactPartition(s, base2, dt, bytes(s"$base2/dt=$dt") / 8 + 1)
    val fracPlain = midTouchedFrac(s"$base2/dt=$dt")
    assert(fracPlain > 0.9,
      f"expected plain repartition to destroy the boxes, touched $fracPlain%.3f")
  }
}
