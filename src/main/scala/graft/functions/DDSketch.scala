package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** DDSketch (Masson, Rim & Lee, VLDB 2019) — a relative-error quantile
  * sketch whose MERGE is exact: buckets are geometric value ranges
  * (γ = (1+α)/(1−α), bucket i covers (γ^(i−1), γ^i]), counters add
  * bucket-wise, so the merge of per-partition/per-day sketches is
  * IDENTICAL to the sketch of the whole input as long as no collapse
  * triggers — the quantile analogue of HLL's register-max union
  * (SketchOps' incremental-landing contract, spec-asserted).
  *
  * Guarantee: any quantile estimate is within relative error α of a true
  * value (each bucket's midpoint 2γ^i/(γ+1) is within α of every value
  * the bucket covers). Size is bounded by `maxBins` live buckets
  * (~log_γ(max/min)); overflow collapses the LOWEST buckets together,
  * preserving the guarantee for upper quantiles (the p95/p99s ops teams
  * actually track). Zeros get a dedicated bucket below all positives.
  *
  * Complements `approx_quantiles` (Spark's GK sketch — one-shot rank
  * error, not landable): this is REUSABLE state, the difference between
  * "estimate once" and "maintain p99 incrementally".
  */
class DDSketch(alpha: Double = DDSketch.Alpha, maxBins: Int = DDSketch.MaxBins)
    extends Aggregator[Double, mutable.Map[Int, Long], Map[Int, Long]] {
  require(alpha > 0 && alpha < 1 && maxBins > 2)
  private val logG = math.log((1 + alpha) / (1 - alpha))

  override def zero: mutable.Map[Int, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[Int, Long], x: Double): mutable.Map[Int, Long] = {
    val bin =
      if (x <= 0.0) DDSketch.ZeroBin // zeros (and guards negatives) below all
      else math.ceil(math.log(x) / logG).toInt
    b(bin) = b.getOrElse(bin, 0L) + 1L
    DDSketch.maybeCollapse(b, maxBins)
    b
  }

  override def merge(a: mutable.Map[Int, Long],
      b: mutable.Map[Int, Long]): mutable.Map[Int, Long] = {
    b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
    DDSketch.maybeCollapse(a, maxBins)
    a
  }

  override def finish(b: mutable.Map[Int, Long]): Map[Int, Long] = {
    DDSketch.collapse(b, maxBins) // strict: a FINISHED sketch honors maxBins
    b.toMap
  }
  override def bufferEncoder: Encoder[mutable.Map[Int, Long]] =
    Encoders.kryo[mutable.Map[Int, Long]]
  override def outputEncoder: Encoder[Map[Int, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
}

/** Re-merges already-finished sketches (Map columns) — the second-stage
  * aggregator for landed per-partition sketches. */
class DDSketchMerge(maxBins: Int = DDSketch.MaxBins)
    extends Aggregator[Map[Int, Long], mutable.Map[Int, Long], Map[Int, Long]] {
  override def zero: mutable.Map[Int, Long] = mutable.Map.empty
  override def reduce(b: mutable.Map[Int, Long],
      m: Map[Int, Long]): mutable.Map[Int, Long] = {
    m.foreach { case (k, c) => b(k) = b.getOrElse(k, 0L) + c }
    DDSketch.maybeCollapse(b, maxBins)
    b
  }
  override def merge(a: mutable.Map[Int, Long],
      b: mutable.Map[Int, Long]): mutable.Map[Int, Long] = reduce(a, b.toMap)
  override def finish(b: mutable.Map[Int, Long]): Map[Int, Long] = {
    DDSketch.collapse(b, maxBins)
    b.toMap
  }
  override def bufferEncoder: Encoder[mutable.Map[Int, Long]] =
    Encoders.kryo[mutable.Map[Int, Long]]
  override def outputEncoder: Encoder[Map[Int, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
}

object DDSketch {
  val Alpha = 0.01    // 1% relative error
  val MaxBins = 2048  // covers ~10 orders of magnitude at α=0.01
  val ZeroBin: Int = Int.MinValue
  def gamma: Double = (1 + Alpha) / (1 - Alpha)

  /** Slack the transient aggregation buffer may grow past maxBins before
    * a collapse fires: amortizes the O(B log B) key sort to one fold per
    * `slack` NEW-bucket creations (a monotonically-decreasing input would
    * otherwise re-sort per row once saturated), at the cost of a bounded
    * +slack transient footprint. Finished/landed sketches are always
    * strictly collapsed to maxBins in finish(). Fold-into-ceiling is
    * additive and order-insensitive, so deferring collapse yields the
    * SAME final sketch as eager collapse (spec-asserted). */
  private[graft] def slack(maxBins: Int): Int = math.max(maxBins >> 4, 8)

  private[graft] def maybeCollapse(b: mutable.Map[Int, Long], maxBins: Int): Unit =
    if (b.size > maxBins + slack(maxBins)) collapse(b, maxBins)

  private[graft] def collapse(b: mutable.Map[Int, Long], maxBins: Int): Unit = {
    // fold ALL excess lowest buckets into their ceiling in ONE sorted
    // pass (upper quantiles keep their guarantee, the collapsed tail
    // degrades first) — a per-excess-bucket loop would re-sort the key
    // set once per evicted bucket on the aggregation hot path
    val excess = b.size - maxBins
    if (excess > 0) {
      val lows = b.keysIterator.filter(_ != ZeroBin).toSeq.sorted.take(excess + 1)
      var folded = 0L
      lows.dropRight(1).foreach(k => folded += b.remove(k).get)
      b(lows.last) = b.getOrElse(lows.last, 0L) + folded
    }
  }

  /** Sorted entry array of a sketch column — materialize ONCE per sketch
    * (as a select stage) before extracting several quantiles: the sort
    * is the expensive part of extraction, and inlining it into each
    * [[quantileFromEntries]] call would re-sort per quantile. */
  def sortedEntries(sketch: Column): Column = array_sort(map_entries(sketch))

  /** In-plan quantile extraction from a [[sortedEntries]] column: one
    * bounded fold — no UDF, no collect. Rank convention:
    * target = clamp(ceil(q·n), 1, n), the value at that rank in the
    * sorted multiset the sketch summarizes. */
  def quantileFromEntries(entries: Column, q: Double): Column = {
    val n = aggregate(entries, lit(0L), (acc, e) => acc + e.getField("value"))
    val target = greatest(least(ceil(lit(q) * n).cast("long"), n), lit(1L))
    val found = aggregate(
      entries,
      struct(lit(0L).as("cum"), lit(null).cast("int").as("bin")),
      (acc, e) => {
        val cum = acc.getField("cum") + e.getField("value")
        struct(cum.as("cum"),
          when(acc.getField("bin").isNotNull, acc.getField("bin"))
            .otherwise(when(cum >= target, e.getField("key"))).as("bin"))
      },
      acc => acc.getField("bin"))
    when(found === lit(ZeroBin), lit(0.0))
      .otherwise(lit(2.0) * pow(lit(gamma), found) / lit(gamma + 1.0))
  }

  /** One-shot convenience for a single quantile. */
  def sketchQuantile(sketch: Column, q: Double): Column =
    quantileFromEntries(sortedEntries(sketch), q)
}
