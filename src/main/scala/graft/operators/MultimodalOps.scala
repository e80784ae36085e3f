package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal binary-column plumbing, SURVEY.md §2 #35 (rows-only).
  *
  * Images/audio/video are opaque `binary` payloads with typed metadata.
  * The decode step is a clearly-marked deterministic STUB (no media codecs
  * in this container), but the Spark-side plumbing is real: BinaryType
  * schema, partition-preserving `mapPartitions` over a typed Dataset, and
  * batched iteration (vectorized-decoder shape — a real decoder would amortize
  * codec init per batch exactly like this).
  *
  * At 100 TB the payloads live in parquet binary columns colocated with
  * metadata; this operator is a single map-side pass with no shuffle.
  */
object MultimodalOps {

  case class MMRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MMDecoded(doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, feat_mean: Double)

  val DecodeBatchSize = 64

  /** STUB decoder: a real implementation would decode image/audio frames
    * here (per batch, reusing codec state). This fake derives deterministic
    * "pixels" from payload bytes so tests are stable. */
  private def decodeBatch(batch: Seq[MMRecord]): Seq[MMDecoded] =
    batch.map { r =>
      val len = r.payload.length
      // fake intrinsic dims from content, as a decoder would report
      val width = 16 + (math.abs(r.payload.headOption.getOrElse(0: Byte).toInt) % 16)
      val height = 16 + (len % 16)
      var acc = 0L
      var i = 0
      while (i < len) { acc += (r.payload(i) & 0xff); i += 1 }
      val featMean = if (len == 0) 0.0 else acc.toDouble / len
      MMDecoded(r.doc_id, r.media_type, len.toLong, width, height, featMean)
    }

  /** Typed multimodal source: documents' text bytes stand in for media
    * payloads; media_type cycles image/audio/video. */
  def mmSource(s: SparkSession, dir: String): Dataset[MMRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MMRecord]
  }

  /** #35 mm_metadata (rows-only) — batched decode-stub over binary
    * payloads; schema/partitioning/batch shape are the real contract. */
  def mmMetadata(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mmSource(s, dir)
      .mapPartitions(it => it.grouped(DecodeBatchSize).flatMap(decodeBatch))
      .toDF()
      .orderBy("doc_id")
  }
}
