package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality assertion pass — the ingest gate a 100 TB pipeline runs
  * before promoting a drop: one row per rule (uniqueness, ranges,
  * null-rates, referential integrity) with violation counts.
  *
  * Shape at scale: ALL orders-side rules — including the customer
  * referential-integrity probe — ride ONE pass over orders (a left join
  * + a single conditional aggregation, unpivoted to rule rows by a
  * stack() over the one-row result); lineitem rules ride one more scan.
  * No rule adds a pass over the fact, so adding assertions is free.
  */
object QualityOps {

  /** dq_checks — fixed rule set over orders/customer/lineitem:
    * primary-key uniqueness, non-negative totals, date completeness,
    * orders→customer referential integrity, and lineitem quantity range.
    * All counts exact longs → oracle hash-compares bit-identically. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    // the RI probe must NOT assume the dim is clean: a duplicated
    // c_custkey would fan orders rows out through the join and corrupt
    // every orders-side count — exactly the defect a DQ gate exists to
    // catch. Join on the DISTINCT key set (tiny extra dim shuffle) and
    // check dim-key uniqueness as its own rule from the same dim scan.
    val cust = Tables.customer(s, dir)
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("dup_keys"))
    val custRules = cust.select(lit("customer_pk_unique").as("rule"),
      col("dup_keys").as("violations"), col("n").as("checked"))
    val custKeys = Tables.customer(s, dir).select(col("c_custkey")).distinct()
    // one pass over orders answers every orders rule, RI included
    val o = orders.join(custKeys, col("o_custkey") === col("c_custkey"), "left_outer")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"),
        sum((col("o_totalprice") < 0).cast("long")).as("neg_price"),
        sum(col("o_orderdate").isNull.cast("long")).as("null_date"),
        sum(col("c_custkey").isNull.cast("long")).as("ri_orphans"))
    val oRules = o.select(
      expr("stack(4, 'orders_pk_unique', dup_keys, 'orders_price_nonneg', neg_price, " +
        "'orders_date_notnull', null_date, 'orders_custkey_ri', ri_orphans) AS (rule, violations)"),
      col("n").as("checked"))
    val lRules = Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("n"),
        sum((col("l_quantity") < 1 || col("l_quantity") > 50).cast("long")).as("qty_range"))
      .select(lit("lineitem_qty_range").as("rule"),
        col("qty_range").as("violations"), col("n").as("checked"))
    oRules.unionByName(lRules).unionByName(custRules)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }

  /** Re-key offset for [[snapshotDiff]]'s synthetic inserts — far above
    * any test keyspace, shared with the oracle SQL. */
  val DiffInsertOffset = 1000000000L

  /** snapshot_diff — CDC reconciliation between two snapshots of a
    * dimension (the validation report a merge-upsert pipeline lands
    * next to every promoted drop): per-status row counts plus how many
    * surviving keys changed their balance.
    *
    * Snapshot B derives deterministically from A so the oracle can
    * replay it: key%10=0 deleted, key%7=0 balance +100, key%13=0
    * duplicated above the keyspace as inserts (delete wins on overlap).
    * Plan: ONE full-outer sort-merge join on the key — presence flags
    * on each side, never null-sentinel value columns — then a
    * partial-agg shuffle on the 4-row status key. At 100 TB both
    * snapshots shuffle once on the join key; nothing else moves. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame =
    snapshotDiffFrom(Tables.customer(s, dir))

  /** Core on any (c_custkey, c_acctbal, c_mktsegment) frame. */
  def snapshotDiffFrom(cust: DataFrame): DataFrame = {
    val a = cust.select(col("c_custkey").as("k"), col("c_acctbal").as("bal_a"),
      col("c_mktsegment").as("seg_a"), lit(true).as("in_a"))
    val b = cust.where(col("c_custkey") % 10 =!= 0)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
          .otherwise(col("c_acctbal")).as("bal_b"),
        col("c_mktsegment").as("seg_b"), lit(true).as("in_b"))
      .unionByName(cust.where(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + lit(DiffInsertOffset)).as("k"),
          col("c_acctbal").as("bal_b"), col("c_mktsegment").as("seg_b"),
          lit(true).as("in_b")))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("in_a").isNull, lit("added"))
          .when(col("in_b").isNull, lit("removed"))
          .when(col("bal_a") =!= col("bal_b") || col("seg_a") =!= col("seg_b"),
            lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull &&
          col("bal_a") =!= col("bal_b"), 1L).otherwise(0L)).as("n_bal_changed"))
      .orderBy("status")
  }

  /** key_skew_report — the pre-join skew diagnostic: top-k heaviest
    * values of a join/partition key with each one's row share and its
    * skew multiple vs a perfectly uniform key (n·|keys|/rows — the
    * factor by which that key's reduce task outweighs the average).
    * This is the measurement you run BEFORE reaching for
    * `skew_join_salted` or AQE skew hints, and the panel a 100 TB
    * pipeline lands per ingest so a drifting hot key pages someone
    * before it wedges a stage. Plan: one partial-agg shuffle on the
    * key, global totals as a broadcast single-row aggregate, top-k as
    * TakeOrderedAndProject — output bounded at k rows whatever the
    * fact size. All-integer inputs → deterministic ratio doubles. */
  def keySkewReport(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    keySkewOf(Tables.eventsUs(s, dir), "user_id", k)

  /** The parameterized core the scaladoc above promises: top-k heaviest
    * values of ANY (table, key) pair — orders.o_custkey, lineitem
    * .l_partkey, documents.source all take the same one-shuffle panel.
    * [[graft.Jobs.runKeySkewJob]] lands it dt-stamped per ingest and
    * [[graft.Jobs.keySkewDrift]] diffs two days' drops. */
  def keySkewOf(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("n_rows")).as("share"),
        (col("n").cast("double") * col("n_keys") / col("n_rows")).as("skew_x"))
      .orderBy(col("n").desc, col("key")).limit(k)
  }
}
