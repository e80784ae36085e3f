package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** GRMM v1 — the deterministic binary media container the multimodal
  * operators DECODE (SURVEY.md §2 #35). The reference pipeline treats
  * media artifacts as first-class binary blobs
  * (external_resources.py:54–68 writes PNG bytes); this container is the
  * engine's stand-in for such a codec format: real byte-level structure
  * that the decode expressions parse, so `mm_metadata`/`mm_features`/
  * `mm_frames` outputs are provably functions of the payload BYTES — not
  * of sibling schema columns (the round-7 "decode stubbed" deduction).
  *
  * Layout (big-endian, 14-byte header + sample body):
  * {{{
  *   [0..3]   magic "GRMM"
  *   [4]      version           (1)
  *   [5]      kind              0=image 1=audio 2=video
  *   [6..7]   width   u16       (audio: samples per frame)
  *   [8..9]   height  u16       (audio: 1)
  *   [10]     channels u8
  *   [11..12] n_frames u16      (image: 1)
  *   [13]     header checksum   XOR of bytes [0..12]
  *   [14..]   body: n_frames * width * height * channels sample bytes
  * }}}
  *
  * A payload is VALID iff magic/version match, the checksum holds, dims
  * are positive, and the body length is exactly the dim product. The
  * decoders below surface invalid payloads as `valid=false` / null —
  * never a crash and never a made-up value — the contract a 100 TB
  * ingest needs when a corrupt blob lands mid-partition.
  *
  * All three decoders are native codegen `Expression`s (the CharStats
  * pattern): one tight pass over the bytes inside whole-stage codegen,
  * no UDF serialization.
  */
object MediaCodec {
  val Magic: Array[Byte] = Array('G'.toByte, 'R'.toByte, 'M'.toByte, 'M'.toByte)
  val Version: Byte = 1
  val HeaderLen = 14
  val KindImage = 0
  val KindAudio = 1
  val KindVideo = 2

  val FeatureDim = 16
  /** Video frame sampling stride: keep every 4th frame (a real sampler
    * seeks keyframes — same emit shape and cost model). */
  val SampleEvery = 4

  // ---------- encode (synthesis side: the test-data stand-in for a real
  // codec; decode NEVER sees these rules, only the bytes) ----------

  /** Deterministic dims per (kind, seed) — small enough that a 60 k-doc
    * bench partition synthesizes ~3 kB/doc, big enough to exercise
    * multi-frame bodies. */
  def dimsFor(kind: Int, seed: Long): (Int, Int, Int, Int) = {
    val s = java.lang.Long.remainderUnsigned(seed * 0x9E3779B97F4A7C15L, 1L << 32)
    kind match {
      case KindImage => ((16 + s % 16).toInt, (16 + (s >> 8) % 16).toInt, 3, 1)
      case KindAudio => ((64 + s % 64).toInt, 1, (1 + (s >> 8) % 2).toInt, (4 + (s >> 16) % 4).toInt)
      case _ => ((8 + s % 12).toInt, (8 + (s >> 8) % 12).toInt, 3, (4 + (s >> 16) % 8).toInt)
    }
  }

  /** Build a GRMM payload: header from dims, body = `content` bytes
    * cycled with a position mix (so two docs with different text get
    * different bodies, and every body byte depends on the content). */
  def encode(kind: Int, width: Int, height: Int, channels: Int,
      nFrames: Int, content: Array[Byte]): Array[Byte] = {
    val bodyLen = nFrames * width * height * channels
    val out = new Array[Byte](HeaderLen + bodyLen)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = Version
    out(5) = kind.toByte
    out(6) = ((width >> 8) & 0xff).toByte
    out(7) = (width & 0xff).toByte
    out(8) = ((height >> 8) & 0xff).toByte
    out(9) = (height & 0xff).toByte
    out(10) = (channels & 0xff).toByte
    out(11) = ((nFrames >> 8) & 0xff).toByte
    out(12) = (nFrames & 0xff).toByte
    var x = 0
    var i = 0
    while (i < 13) { x ^= (out(i) & 0xff); i += 1 }
    out(13) = x.toByte
    i = 0
    while (i < bodyLen) {
      val c = if (content.length == 0) 0 else content(i % content.length) & 0xff
      out(HeaderLen + i) = ((c + i * 31) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Encode with [[dimsFor]] geometry — the one-call synthesis used by
    * [[graft.operators.MultimodalOps.mmSource]]. */
  def encodeFor(kind: Int, seed: Long, content: Array[Byte]): Array[Byte] = {
    val (w, h, c, f) = dimsFor(kind, seed)
    encode(kind, w, h, c, f, content)
  }

  // ---------- decode kernels (shared by eval and codegen) ----------

  /** Parse + validate the header; returns (width, height, channels,
    * n_frames, kind) or null if the payload is not a well-formed GRMM
    * container (wrong magic/version/checksum/body length/dims). */
  def parseHeader(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < HeaderLen) return null
    if (b(0) != Magic(0) || b(1) != Magic(1) || b(2) != Magic(2) ||
        b(3) != Magic(3) || b(4) != Version) return null
    var x = 0
    var i = 0
    while (i < 13) { x ^= (b(i) & 0xff); i += 1 }
    if (b(13) != x.toByte) return null
    val kind = b(5) & 0xff
    val w = ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    val h = ((b(8) & 0xff) << 8) | (b(9) & 0xff)
    val c = b(10) & 0xff
    val f = ((b(11) & 0xff) << 8) | (b(12) & 0xff)
    if (kind > KindVideo || w <= 0 || h <= 0 || c <= 0 || f <= 0) return null
    if (b.length.toLong - HeaderLen != f.toLong * w * h * c) return null
    Array(w, h, c, f, kind)
  }

  val InfoType: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("kind", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("body_len", LongType, nullable = false),
    StructField("body_sum", LongType, nullable = false)))

  /** One pass: header fields + body byte sum. Invalid payload → a row
    * with valid=false and zeroed fields (kept, not dropped — the caller
    * decides quarantine policy). */
  def computeInfo(b: Array[Byte]): InternalRow = {
    val hd = parseHeader(b)
    if (hd == null)
      return new GenericInternalRow(Array[Any](false, -1, 0, 0, 0, 0,
        (if (b == null) 0L else b.length.toLong), 0L))
    var acc = 0L
    var i = HeaderLen
    while (i < b.length) { acc += (b(i) & 0xff); i += 1 }
    new GenericInternalRow(Array[Any](true, hd(4), hd(0), hd(1), hd(2), hd(3),
      (b.length - HeaderLen).toLong, acc))
  }

  val FeaturesType: StructType = StructType(Seq(
    StructField("checksum", LongType, nullable = false),
    StructField("f", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Body bytes folded into a FeatureDim histogram (bucket = position mod
    * dim, weight = byte/255), L2-normalized; checksum = FNV-1a over the
    * e6-scaled components (order-dependent, exact, engine-portable). Null
    * for invalid payloads — a feature vector must never be fabricated
    * from garbage bytes. */
  def computeFeatures(b: Array[Byte]): InternalRow = {
    if (parseHeader(b) == null) return null
    val f = new Array[Float](FeatureDim)
    var i = HeaderLen
    while (i < b.length) {
      f((i - HeaderLen) % FeatureDim) += (b(i) & 0xff) / 255.0f
      i += 1
    }
    var n2 = 0.0
    var j = 0
    while (j < FeatureDim) { n2 += f(j).toDouble * f(j); j += 1 }
    val n = math.sqrt(n2)
    if (n != 0.0) { j = 0; while (j < FeatureDim) { f(j) = (f(j) / n).toFloat; j += 1 } }
    var h = 0xcbf29ce484222325L
    j = 0
    while (j < FeatureDim) {
      h = (h ^ (math.floor(f(j).toDouble * 1e6 + 0.5).toLong & 0xffffffffL)) * 0x100000001b3L
      j += 1
    }
    new GenericInternalRow(Array[Any](h, new GenericArrayData(f)))
  }

  val FrameType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_len", LongType, nullable = false),
    StructField("frame_sum", LongType, nullable = false)))

  /** Every SampleEvery-th frame's (index, byte length, byte sum), from
    * the decoded frame geometry (frame = width*height*channels bytes).
    * Null for invalid payloads; empty array never occurs (n_frames ≥ 1
    * ⇒ frame 0 is always sampled). */
  def computeFrames(b: Array[Byte]): GenericArrayData = {
    val hd = parseHeader(b)
    if (hd == null) return null
    val frameLen = hd(0) * hd(1) * hd(2)
    val nFrames = hd(3)
    val out = new java.util.ArrayList[InternalRow]()
    var idx = 0
    while (idx < nFrames) {
      if (idx % SampleEvery == 0) {
        var acc = 0L
        var i = HeaderLen + idx * frameLen
        val end = i + frameLen
        while (i < end) { acc += (b(i) & 0xff); i += 1 }
        out.add(new GenericInternalRow(Array[Any](idx, frameLen.toLong, acc)))
      }
      idx += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ---------- Column-level entries ----------

  def mediaInfo(c: Column): Column =
    ColumnBridge.column(MediaInfo(ColumnBridge.expression(c)))
  def mediaFeatures(c: Column): Column =
    ColumnBridge.column(MediaFeatures(ColumnBridge.expression(c)))
  def mediaFrames(c: Column): Column =
    ColumnBridge.column(MediaFrames(ColumnBridge.expression(c)))
}

/** Base for the three binary decoders: binary in, kernel in the companion
  * (shared by interpreted eval and the one-line codegen call). */
sealed trait MediaDecodeExpr extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary argument, got ${other.simpleString}")
    }
}

/** Header + body stats decode (see [[MediaCodec.computeInfo]]). */
case class MediaInfo(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = MediaCodec.InfoType
  override def prettyName: String = "graft_media_info"
  override def nullSafeEval(v: Any): Any =
    MediaCodec.computeInfo(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodec.computeInfo($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Feature-vector decode (see [[MediaCodec.computeFeatures]]). */
case class MediaFeatures(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = MediaCodec.FeaturesType
  override def nullable: Boolean = true // invalid container → null
  override def prettyName: String = "graft_media_features"
  override def nullSafeEval(v: Any): Any =
    MediaCodec.computeFeatures(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodec.computeFeatures($c);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sampled-frame decode (see [[MediaCodec.computeFrames]]). */
case class MediaFrames(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = ArrayType(MediaCodec.FrameType, containsNull = false)
  override def nullable: Boolean = true // invalid container → null
  override def prettyName: String = "graft_media_frames"
  override def nullSafeEval(v: Any): Any =
    MediaCodec.computeFrames(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodec.computeFrames($c);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
