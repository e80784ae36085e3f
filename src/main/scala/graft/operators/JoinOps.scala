package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{BloomPrune, Det, SkewJoin}

/** Join-infrastructure operators surfaced as driver-checked queries: the
  * two 100 TB join techniques ([[graft.functions.SkewJoin]] salting and
  * [[graft.functions.BloomPrune]] probe-side pruning) exercised end to
  * end. Both are semantics-preserving — the query result is IDENTICAL to
  * the plain join — so each gets a full DuckDB oracle over the plain-SQL
  * join, proving no row is lost or duplicated by the rewrite.
  *
  * Reference capability: the reference's country⋈ISO and price⋈geometry
  * merges (world_map_transformer.py:138–166) are pandas single-node
  * merges; at cluster scale the same joins need exactly these two
  * techniques when the dim is too big to broadcast (salting for the hot
  * "unknown country" key) or highly selective (bloom pruning).
  */
object JoinOps {

  /** skew_join_salted — per-nation revenue through a SALTED lineitem ⋈
    * supplier join: the fact side gets a deterministic salt in
    * [0, 16), the supplier side is exploded across all salts, and the
    * join runs on (suppkey, salt) so a hot supplier spreads over 16
    * reducers instead of melting one. Aggregation then re-keys on
    * nation. Result provably equals the plain join (the oracle IS the
    * plain join) — salting is a pure physical rewrite. */
  def skewJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_suppkey").as("s_suppkey"),
      Det.e2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("long").as("cents"))
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    SkewJoin.saltedJoin(li, sup, "s_suppkey")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        (sum("cents").cast("double") / 100.0).as("revenue"))
      .orderBy("s_nationkey")
  }

  /** bloom_prune_join — lineitem rows for a selective (1%) slice of
    * orders, with the probe side bloom-pruned BEFORE its shuffle: a
    * bloom sketch of the filtered dim keys is baked into the plan as one
    * binary literal and evaluated by the native `might_contain`
    * expression at the scan, so ~99% of the fact never leaves the scan
    * stage. No false negatives → the result equals the plain join (the
    * oracle IS the plain join); false positives are dropped by the join
    * itself. */
  def bloomPruneJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
      Det.e2(col("l_extendedprice")).cast("long").as("cents"))
    val dim = Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select("o_orderkey", "o_orderpriority")
    BloomPrune.bloomPrunedJoin(li, dim, "o_orderkey")
      .orderBy("o_orderkey", "l_linenumber")
  }
}
