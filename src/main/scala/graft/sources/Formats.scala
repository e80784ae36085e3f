package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format layer beyond parquet — the reference's other inputs:
  * a CSV code-lookup (world_map_transformer.py:138–139 reads the
  * ALPHA-2/ALPHA-3 map with pd.read_csv) and JSON API payloads
  * (external_resources.py:126–137).
  *
  * Explicit schemas everywhere: schema inference is an extra full read of
  * the data — never acceptable on a 100 TB source.
  */
object Formats {

  /** CSV with explicit schema + header, no inference pass. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-lines with explicit schema (each line one record — the
    * splittable layout for distributed reads). */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines that SURVIVES malformed input: bad lines come back as a
    * row with null fields and the raw text in `_corrupt_record` instead
    * of failing the job — on a 100 TB feed a handful of broken records
    * must be quarantined (filter on the column), never fatal. */
  def readJsonlPermissive(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ORC (columnar alternative to parquet; same pushdown/pruning path —
    * the scan reports PushedFilters exactly like parquet). zlib is ORC's
    * portable default codec. */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)
}
