package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SynthDocsSource

/** The custom DSv2 connector must behave like a well-partitioned parquet
  * table: deterministic rows, pruned generation, pushed ranges that elide
  * whole partitions. */
class SynthDocsSourceSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  private val fmt = classOf[SynthDocsSource].getName

  private def docs(rows: Long = 1000, parts: Int = 8) =
    s.read.format(fmt).option("rows", rows).option("partitions", parts).load()

  test("deterministic at any parallelism") {
    assert(docs().count() == 1000)
    val a = docs(200, 1).orderBy("doc_id").collect().map(_.toString).toSeq
    val b = docs(200, 7).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b, "row content must not depend on partitioning")
    // schema + content sanity: n_chars really is the text length
    assert(docs(50).filter(length(col("text")) =!= col("n_chars")).count() == 0)
    assert(docs(50).filter(col("source").rlike("^src[0-9]+$")).count() == 50)
  }

  test("column pruning reaches the scan (only requested columns generated)") {
    val plan = docs().select("doc_id", "lang").queryExecution.executedPlan.toString
    assert(plan.contains("cols=doc_id,lang"), s"pruned scan not planned:\n$plan")
    assert(!plan.contains("cols=doc_id,text"), "text must be pruned away")
  }

  test("doc_id range pushdown clips ids and elides partitions") {
    val q = docs(1000, 8).filter(col("doc_id") >= 900 && col("doc_id") < 950)
    assert(q.count() == 50)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ids=[900,949]"), s"range not pushed:\n$scan")
    // 1000 rows / 8 partitions = 125-id splits; [900,949] lives in ONE
    val parts = q.rdd.getNumPartitions
    assert(parts == 1, s"expected 1 surviving partition, got $parts")
    // equality prunes to a single id
    val one = docs(1000, 8).filter(col("doc_id") === 123L)
    assert(one.count() == 1 &&
      one.queryExecution.executedPlan.toString.contains("ids=[123,123]"))
    // contradictory range plans to zero partitions, zero rows
    val none = docs(1000, 8).filter(col("doc_id") > 800 && col("doc_id") < 700)
    assert(none.count() == 0 && none.rdd.getNumPartitions == 0)
    // strict bounds at the Long extremes saturate (no wraparound back to
    // all-rows: the filter is accepted, Spark won't re-check it)
    assert(docs(1000, 8).filter(col("doc_id") > Long.MaxValue).count() == 0)
    assert(docs(1000, 8).filter(col("doc_id") < Long.MinValue).count() == 0)
  }

  test("aggregate pushdown answers COUNT/MIN/MAX from metadata (no generation)") {
    // a trillion virtual rows: any plan that actually generates rows
    // cannot finish; metadata answering must
    val trillion = s.read.format(fmt)
      .option("rows", "1000000000000").option("partitions", 8).load()
    val r = trillion.agg(count(lit(1)), min("doc_id"), max("doc_id")).collect().head
    assert(r.getLong(0) == 1000000000000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 999999999999L)
    // composes with filter pushdown: the clipped range is summarized
    val f = trillion.filter(col("doc_id") >= 500 && col("doc_id") < 1500)
      .agg(count(lit(1)), min("doc_id"), max("doc_id")).collect().head
    assert(f.getLong(0) == 1000L && f.getLong(1) == 500L && f.getLong(2) == 1499L)
    assert(trillion.agg(count(lit(1))).queryExecution.executedPlan.toString
      .contains("metadata-only"))
    // empty range: count 0, null min/max
    val e = trillion.filter(col("doc_id") < 0)
      .agg(count(lit(1)), min("doc_id"), max("doc_id")).collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2))
    // grouped or non-range aggregates fall back to real generation
    val g = docs(300, 4).groupBy("lang").agg(count(lit(1)).as("n"))
    assert(g.agg(sum("n")).collect().head.getLong(0) == 300L)
    assert(!g.queryExecution.executedPlan.toString.contains("metadata-only"))
  }

  test("unsupported predicates still filter correctly (residual evaluation)") {
    val q = docs(300, 4).filter(col("lang") === "en" && col("doc_id") < 100)
    val manual = docs(300, 4).collect()
      .filter(r => r.getAs[String]("lang") == "en" && r.getAs[Long]("doc_id") < 100)
    assert(q.count() == manual.length)
  }

  test("micro-batch streaming: batch-identical rows, delivered in offset slices") {
    val stream = s.readStream.format(fmt)
      .option("rows", 50).option("partitions", 4).option("rowsPerBatch", 20)
      .load()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_synth_stream").start()
    try {
      q.processAllAvailable()
      val out = s.table("graft_synth_stream").collect()
      assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 50L))
      // purity: streamed rows identical to the batch read of the same ids
      val batch = docs(50).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      out.foreach(r =>
        assert(r.getAs[String]("text") == batch(r.getAs[Long]("doc_id"))))
      // the cap really paced delivery: ≥3 non-empty micro-batches (20/20/10)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the whole id space (case-insensitive option)") {
    val stream = s.readStream.format(fmt)
      .option("rows", 45).option("ROWSPERBATCH", 20) // odd casing must bind
      .load()
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").format("memory").queryName("graft_synth_avail")
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
      assert(s.table("graft_synth_avail").count() == 45,
        "run-to-completion must emit every id, not just the first batch")
    } finally q.stop()
  }
}
