package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — the 100 TB pattern for a selective
  * fact⋈dim join: build a bloom filter over the (small) build side's
  * keys, and filter the (huge) probe side BEFORE its shuffle, so rows
  * that cannot match never leave the scan stage. Spark injects this
  * automatically in some shapes (runtime row-level filtering); this
  * utility makes it explicit and deterministic for any equi join.
  *
  * Correctness: a bloom filter has no false negatives, so pruning keeps
  * every true match; false positives (rate `fpp`) pass the prefilter and
  * are dropped by the join itself — the join result is IDENTICAL to the
  * unpruned join, spec-asserted. The sketch is model metadata (~1.2 MB at
  * 1M keys / 1% fpp), baked into the plan as one binary literal and
  * evaluated by the native `might_contain` expression — no UDF.
  *
  * Reference capability: the reference joins its per-country price rows
  * against the small ISO lookup (world_map_transformer.py:138–166); at
  * 100 TB the probe-side prune is what keeps that join's shuffle
  * proportional to the matching rows.
  */
object BloomPrune {

  /** `might_contain(sketch, value)` as a Column (native expression). */
  def mightContain(sketchBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketchBytes), ColumnBridge.expression(value)))

  /** Inner equi-join of `probe` to `build` on `key`, with the probe side
    * bloom-pruned before the shuffle. `expectedItems` sizes the sketch
    * (defaults to a count of the build side — one cheap job on the small
    * frame). */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, key: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    // integral keys only: the sketch is built over putLong and probed by
    // mightContainLong — a string key would hash differently on the two
    // sides and silently prune TRUE matches (false negatives). Fail fast.
    Seq(probe, build).foreach { df =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(key).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"bloomPrunedJoin requires an integral key, got $key: ${dt.simpleString} " +
          "— hash non-integral keys to a long (xxhash64) on both sides first")
    }
    val n = if (expectedItems > 0) expectedItems else build.count()
    val bf = build.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    probe
      .filter(mightContain(bos.toByteArray, col(key).cast("long")))
      .join(build, Seq(key))
  }
}
