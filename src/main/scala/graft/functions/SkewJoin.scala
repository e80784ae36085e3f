package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (a hot
  * app id, an empty-string country), a plain shuffle join sends the whole
  * hot key to one reducer. Salting splits it: the skewed (large) side gets
  * a random salt in [0, buckets), the small side is exploded across all
  * salt values, and the join runs on (key, salt) — the hot key now spreads
  * over `buckets` reducers.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * utility is for the cases AQE can't split (aggregations keyed on the
  * skewed column upstream, or non-SMJ plans) and as an explicit, testable
  * statement of the technique for 100 TB runs.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, spreading each key over
    * `buckets` reducers. Row-level results are identical to
    * `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    // deterministic pseudo-salt (hash of whole row + monotonic id would be
    // nondeterministic under retries; xxhash64 of all columns is stable)
    val saltCol: Column = pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets))
    val salted = big.withColumn("__salt", saltCol)
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<long>")))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
