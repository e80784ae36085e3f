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

  test("quantile_sketch: merged == direct, every estimate within α of the exact percentile") {
    import graft.functions.DDSketch
    val rows = SketchOps.quantileSketch(s, sf).collect()
    assert(rows.length == 5, "one row per priority")
    // exact per-priority percentiles at the sketch's rank convention
    val cents = Tables.orders(s, sf)
      .select(col("o_orderpriority").as("p"),
        graft.functions.Det.e2(col("o_totalprice")).cast("double").as("c"))
      .collect().map(r => (r.getAs[String]("p"), r.getAs[Double]("c")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exactQ(xs: Array[Double], q: Double): Double =
      xs(math.max(math.ceil(q * xs.length).toInt, 1) - 1)
    rows.foreach { r =>
      val xs = cents(r.getAs[String]("priority"))
      for ((q, name) <- Seq((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))) {
        val direct = r.getAs[Double](s"${name}_direct")
        val merged = r.getAs[Double](s"${name}_merged")
        assert(direct == merged,
          s"$name: bucket-add merge must be exact ($direct vs $merged)")
        val exact = exactQ(xs, q)
        assert(math.abs(direct - exact) / exact <= DDSketch.Alpha + 1e-9,
          s"$name: $direct vs exact $exact exceeds α")
      }
      assert(r.getAs[Long]("n_partials") > 1, "months actually partition the input")
    }
  }

  test("DDSketch property: random magnitudes, random partitioning — merge == direct, every quantile within α") {
    import graft.functions.DDSketch
    import org.scalacheck.Gen
    val sk = new DDSketch()
    val gen = for {
      mag <- Gen.choose(-3, 9)
      m <- Gen.choose(1.0, 9.999)
    } yield m * math.pow(10, mag)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val xs = Gen.listOfN(500, gen).sample.get
      val direct = xs.foldLeft(sk.zero)(sk.reduce)
      // random partitioning: shuffle, split into 1..8 chunks, merge
      val chunks = rnd.shuffle(xs).grouped(xs.length / (1 + rnd.nextInt(8)) + 1)
      val merged = chunks.map(_.foldLeft(sk.zero)(sk.reduce))
        .reduce((a, b) => sk.merge(a, b))
      assert(sk.finish(direct) == sk.finish(merged),
        s"trial $trial: merge must be bit-equal to direct below the collapse threshold")
      val sorted = xs.sorted
      for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val exact = sorted(math.max(math.ceil(q * sorted.length).toInt, 1) - 1)
        val buf = sk.finish(direct)
        val n = buf.values.sum
        val target = math.max(math.ceil(q * n).toLong, 1L)
        val bin = buf.toSeq.sortBy(_._1)
          .scanLeft((0L, Option.empty[Int])) { case ((cum, found), (k, c)) =>
            (cum + c, found.orElse(if (cum + c >= target) Some(k) else None))
          }.last._2.get
        val est = 2.0 * math.pow(DDSketch.gamma, bin) / (DDSketch.gamma + 1.0)
        assert(math.abs(est - exact) / exact <= DDSketch.Alpha + 1e-9,
          s"trial $trial q=$q: $est vs $exact")
      }
    }
  }

  test("DDSketch collapse: tiny maxBins still answers upper quantiles within α") {
    import graft.functions.DDSketch
    val sk = new DDSketch(0.01, 8)
    // three decades of values: collapse must fold the LOW tail only
    val xs = (1 to 2000).map(i => (i % 1000 + 1).toDouble * 10)
    val rawBuf = xs.foldLeft(sk.zero)((b, x) => sk.reduce(b, x))
    // transient buffer may carry the amortization slack; the FINISHED
    // sketch (what lands / what extraction reads) honors maxBins strictly
    assert(rawBuf.size <= 8 + graft.functions.DDSketch.slack(8),
      s"slack bounds the transient buffer: ${rawBuf.size}")
    val buf = sk.finish(rawBuf)
    assert(buf.size <= 8, s"finished sketch honors maxBins: ${buf.size}")
    // amortized collapse must be a pure scheduling change: feeding every
    // row through a strict collapse after each insert lands bit-equal
    val eager = xs.foldLeft(sk.zero) { (b, x) =>
      val r = sk.reduce(b, x); graft.functions.DDSketch.collapse(r, 8); r
    }
    assert(sk.finish(eager) == buf, "deferred collapse == eager collapse")
    val sorted = xs.sorted
    val exact99 = sorted(math.ceil(0.99 * sorted.length).toInt - 1)
    // recover the p99 estimate from the raw buckets (driver-side twin of
    // the in-plan fold)
    val n = buf.values.sum
    val target = math.max(math.ceil(0.99 * n).toLong, 1L)
    val bin = buf.toSeq.sortBy(_._1)
      .scanLeft((0L, Option.empty[Int])) { case ((cum, found), (k, c)) =>
        (cum + c, found.orElse(if (cum + c >= target) Some(k) else None))
      }.last._2.get
    val est = 2.0 * math.pow(DDSketch.gamma, bin) / (DDSketch.gamma + 1.0)
    assert(math.abs(est - exact99) / exact99 <= 0.01 + 1e-9,
      s"p99 after collapse: $est vs $exact99")
  }
}
