package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * custom-aggregate extension point (partial-aggregated map-side like any
  * built-in agg, kryo-encoded buffer between stages).
  *
  * Guarantees (classic Misra–Gries; the merge is the summed-then-offset
  * rule from the mergeable-summaries literature): with capacity `k` over
  * `n` processed items,
  *   - every item with true count > n/k is present in the sketch, and
  *   - each kept estimate undercounts its true count by at most n/k.
  * Both survive arbitrary partitioning + merging, which is what makes the
  * sketch distributable: each partition builds its own summary, merges
  * subtract only mass that a decrement would have been allowed to remove.
  *
  * The sketch is capacity-bounded (≤ k entries), so collecting the final
  * summary to the driver is model-metadata-sized, like k-means centroids —
  * the 100 TB pattern is sketch pass → tiny candidate set → exact verify
  * pass filtered to candidates (see TextOps.heavyHitters).
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
    if (b.contains(tok)) b(tok) += 1L
    else if (b.size < k) b(tok) = 1L
    else {
      // full + miss: decrement every counter (amortized O(1) per insert —
      // each decrement cancels one earlier increment)
      val dead = mutable.ListBuffer.empty[String]
      b.keysIterator.foreach { key =>
        val c = b(key) - 1L
        if (c <= 0L) dead += key else b(key) = c
      }
      dead.foreach(b.remove)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0 —
      // equivalent to the decrements a streaming pass would have done
      val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ListBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val c = a(key) - cut
        if (c <= 0L) dead += key else a(key) = c
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  // buffer: opaque kryo blob between partial and final aggregation;
  // output: a real MapType column (readable via getAs[Map[_,_]])
  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
