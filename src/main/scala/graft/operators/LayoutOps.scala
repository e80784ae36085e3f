package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — Z-order clustering for multi-dimensional scan
  * pruning.
  *
  * Parquet readers skip whole files / row groups whose column min-max
  * stats exclude a predicate. A table sorted by ONE column prunes well on
  * that column and not at all on any other; interleaving the bits of
  * several columns (a Morton / Z-curve) gives every file a small bounding
  * box in ALL of them, so selective predicates on any clustered dimension
  * skip most files. At 100 TB this is the difference between "scan
  * everything unless you filtered on the sort key" and "skip ~√ of the
  * files on either dimension" — the same layout trick Delta/Iceberg
  * OPTIMIZE ZORDER applies, expressed here as plain Spark: normalize →
  * interleave → repartitionByRange → sortWithinPartitions → write.
  */
object LayoutOps {

  val ZBits = 16 // bits kept per dimension; 2 dims → 32-bit z-values

  /** Bit-interleaved Z-value of pre-normalized dimension columns (each
    * already in [0, 2^bits)). Pure long arithmetic — codegen-friendly,
    * no UDF. Dimension i contributes bit b to z-bit (b * n + i). */
  def zValue(dims: Seq[Column], bits: Int = ZBits): Column = {
    val n = dims.size
    require(n >= 2, "z-ordering needs at least two dimensions")
    require(n * bits <= 62, s"z-value overflows a long: $n dims x $bits bits")
    val terms = for {
      (c, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Min-max normalize a long column into [0, 2^bits) given its global
    * min/max (as columns, typically from a broadcast single-row agg). */
  def normalize(c: Column, mn: Column, mx: Column, bits: Int = ZBits): Column = {
    val span = (mx - mn).cast("double")
    val maxCell = (1L << bits) - 1
    when(span <= 0d, lit(0L)).otherwise(
      least(floor(((c - mn).cast("double") / span) * maxCell).cast("long"), lit(maxCell)))
  }

  /** Z-order `df` by the given LONG columns and write parquet: global
    * min/max ride a broadcast single-row aggregate (never a collect), rows
    * range-partition on the z-value into `numFiles` output files and sort
    * by it within each — every file gets a tight bounding box in every
    * clustered dimension. One exchange total; the scan stays distributed.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], outPath: String,
      numFiles: Int, bits: Int = ZBits): Unit = {
    val reserved = "_z" +: cols.flatMap(c => Seq(s"_mn_$c", s"_mx_$c"))
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"zorderWrite reserves column names ${clash.mkString(", ")}")
    val aggCols = cols.flatMap(c => Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val dims = cols.map(c => normalize(col(c), col(s"_mn_$c"), col(s"_mx_$c"), bits))
    df.join(broadcast(agg))
      .withColumn("_z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop((cols.map(c => s"_mn_$c") ++ cols.map(c => s"_mx_$c")) :+ "_z": _*)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Per-file bounding boxes of `cols` for a written table — the pruning
    * geometry a stats-based reader sees. Diagnostic for specs/audits. */
  def fileBounds(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))): _*)

  /** `zorder_geometry` — the ORACLE-CHECKED twin of the z-layout math:
    * the pruning geometry an idealized rank-balanced z-order layout
    * produces, computed WITHOUT writing. Same normalize + bit-interleave
    * as [[zorderWrite]] (shared code), files assigned by exact z-RANK
    * octile (ntile over (_z, event_id) — the unique tiebreak makes the
    * assignment total-ordered, so DuckDB's ntile reproduces it
    * bit-for-bit), then per-octile bounding boxes. This is precisely the
    * geometry [[zorderLayout]]'s landed files approximate: the write
    * path balances rank ranges by SAMPLING (RangePartitioner), which is
    * the one non-ANSI-reproducible step — so the layout key stays
    * rows-only while every deterministic stage of its math is
    * hash-checked here. Scale note: the ntile window is a global sort —
    * acceptable for a DIAGNOSTIC twin (it exists to oracle-pin the
    * z-math); the production layout path remains [[zorderWrite]]'s
    * sampled range exchange, which sorts distributed. */
  def zorderGeometry(s: org.apache.spark.sql.SparkSession, dir: String,
      files: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.eventsUs(s, dir)
      .select(col("event_id"), col("user_id"), col("us"))
    val agg = ev.agg(
      min(col("user_id")).as("_mn_u"), max(col("user_id")).as("_mx_u"),
      min(col("us")).as("_mn_t"), max(col("us")).as("_mx_t"))
    ev.join(broadcast(agg))
      .withColumn("_z", zValue(Seq(
        normalize(col("user_id"), col("_mn_u"), col("_mx_u")),
        normalize(col("us"), col("_mn_t"), col("_mx_t")))))
      .withColumn("octile",
        ntile(files).over(Window.orderBy(col("_z"), col("event_id"))).cast("long"))
      .groupBy("octile")
      .agg(count(lit(1)).as("rows"),
        min(col("user_id")).as("mn_user_id"), max(col("user_id")).as("mx_user_id"),
        min(col("us")).as("mn_us"), max(col("us")).as("mx_us"))
      .orderBy("octile")
  }

  /** `zorder_layout` query entry (*rows-only* — a layout/write operator):
    * z-order the events table on (user_id, event-time) into 8 files, read
    * the landing back and emit each file's bounding box (filename dropped —
    * output is the stable pruning geometry, one row per file). */
  def zorderLayout(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsUs(s, dir)
      .select(col("user_id"), col("us"), col("event_type"))
    // ONE overwrite-mode landing per (session, input dir): re-invocation
    // redoes the write (it IS the operator) but never grows /tmp
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_zorder_${s.sparkContext.applicationId}_${dir.hashCode.toHexString}").toString
    zorderWrite(ev, Seq("user_id", "us"), out, numFiles = 8)
    fileBounds(s.read.parquet(out), Seq("user_id", "us"))
      .drop("file")
      .orderBy("mn_user_id", "mn_us")
  }
}
