package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated name filter (dev iteration; the driver
    // passes two args and gets the full dump)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same Dev.session shape as Bench/TimeQ — the correctness gate must
    // run the identically-configured engine the benchmarks measure
    val spark = Dev.session(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators that persist intermediates (ngram/minhash dedup, IVF)
      // document an until-consumed cache contract; the result is fully
      // materialized here, so drop the blocks before the next query
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the rows-only contract: every no_oracle key, why no ANSI twin is
    // possible, and the ScalaTest that verifies it — so the driver's
    // report can show "by design, spec-verified" instead of a bare null
    val ro = SparkEntry.rowsOnly.toSeq.sortBy(_._1)
      .map { case (k, (why, spec)) =>
        s"${q(k)}: {${q("reason")}: ${q(why)}, ${q("spec")}: ${q(spec)}}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/rows_only.json"), ro)
    spark.stop()
  }
}
