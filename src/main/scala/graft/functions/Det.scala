package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-arithmetic helpers shared by every oracle-compared operator.
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB
  * running equivalent SQL. Floating-point *sums* are accumulation-order
  * dependent (Spark partial aggregation vs DuckDB sequential), so graft's
  * contract is: scale each double to an exact 64-bit integer at the row
  * level (`floor(x*scale + 0.5)` — pure IEEE ops, bit-identical in both
  * engines), aggregate the integers exactly, and divide back to double only
  * at the result edge (one division of exact inputs is deterministic).
  * This also keeps aggregations in fast long-sum codegen paths.
  */
object Det {
  /** Row-level exact cents: floor(x*100 + 0.5) as BIGINT. */
  def e2(c: Column): Column = floor(c * lit(100.0) + lit(0.5))

  /** Exact-integer sum rendered back to a double with 2 decimals. */
  def sumE2(c: Column): Column = sum(e2(c)).cast("double") / lit(100.0)

  /** Exact mean: integer sum / 100 / count — deterministic double. */
  def avgE2(c: Column): Column =
    sum(e2(c)).cast("double") / lit(100.0) / count(lit(1))
}
