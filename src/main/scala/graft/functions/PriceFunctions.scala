package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Locale-aware price-string parsing + currency conversion as pure
  * `Column` compositions (whole-stage-codegen'd; no UDFs).
  *
  * Mirrors the reference's parse semantics
  * (reference: Scripts/transformers/steam_prices_transformer.py:118–132):
  *   - first regex match of `[0-9]+[,. ]?[0-9]*` (note: at most ONE
  *     separator — "1.234,56" extracts "1.234", faithfully reproducing the
  *     reference's heuristic),
  *   - strip spaces, treat `.` as thousands / `,` as decimal, divide by the
  *     exchange rate to USD,
  *   - if the USD result falls outside [0.1, 100], re-parse treating `.` as
  *     the decimal point (strip `,` only),
  *   - NULL when nothing parseable (reference returns NaN).
  *
  * Rates come from a broadcastable dim with USD pinned to rate 1
  * (steam_prices_transformer.py:95–96).
  */
object PriceFunctions {
  val PriceRegex = "[0-9]+[,. ]?[0-9]*"

  /** Deterministic exchange-rate dim column from the nation key
    * (USD = nation 0 pinned to rate 1, as the reference pins USD). */
  def rateFromNationKey(nationkey: Column): Column =
    when(nationkey === 0, lit(1.0))
      .otherwise(lit(1.0) + (nationkey % 7).cast("double") * lit(0.5))

  /** Locale-format a cents amount as the reference's input price strings do:
    * fmt 0 → "1234,56" (comma decimal), fmt 1 → "1234.56" (dot decimal),
    * fmt 2 → "$ 1234.56" (currency prefix). */
  def formatPriceString(cents: Column, fmt: Column): Column = {
    val whole = floor(cents / lit(100.0)).cast("string")
    val frac = lpad((cents % 100).cast("string"), 2, "0")
    when(fmt === 0, concat(whole, lit(","), frac))
      .when(fmt === 1, concat(whole, lit("."), frac))
      .otherwise(concat(lit("$ "), whole, lit("."), frac))
  }

  /** USD price parsed from a locale price string given a to-USD rate.
    * try_cast (null on unparseable, matching DuckDB TRY_CAST) keeps the
    * hot path to ONE regex per row. */
  def parsePriceToUsd(priceStr: Column, rate: Column): Column = {
    val m = regexp_extract(priceStr, PriceRegex, 0)
    // translate can't map ',' -> '.' while deleting '.', so two steps:
    // delete spaces+dots, then ',' -> '.'
    val s1 = translate(translate(m, " .", ""), ",", ".")
    val s2 = translate(m, " ,", "")
    val p1 = s1.try_cast("double") / rate
    val p2 = s2.try_cast("double") / rate
    when(m.isNull || m === "", lit(null).cast("double"))
      .when(p1 > 100 || p1 < 0.1, p2)
      .otherwise(p1)
  }
}
