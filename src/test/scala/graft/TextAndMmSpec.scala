package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashFunctions.rollingHash64
import graft.functions.VectorFunctions.dotE12
import graft.operators.{MultimodalOps, TextOps}

class TextAndMmSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("langid: scores bounded by word count, prediction in the lang set") {
    val rows = TextOps.textLangid(s, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(TextOps.Langs.contains(r.getAs[String]("pred_lang")))
      assert(r.getAs[Long]("s_en") >= 0)
    }
  }

  test("quality: ratios in [0,1], keep consistent with quality") {
    TextOps.textQuality(s, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1)
      assert(r.getAs[Boolean]("keep") == (q >= 0.5))
    }
  }

  test("tokens: regex tokens >= whitespace tokens for space-joined words") {
    TextOps.textTokens(s, sf).collect().foreach { r =>
      assert(r.getAs[Long]("re_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Double]("chars_per_token") > 0)
    }
  }

  test("fingerprint: deterministic, content-sensitive (FNV-1a)") {
    import s.implicits._
    val df = Seq(("a b c", 1L), ("a b c", 2L), ("a b d", 3L)).toDF("text", "id")
      .select(col("id"), rollingHash64(col("text")).as("fp"))
    val m = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("fp")).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    // spot-check against an independent scala FNV-1a
    val want = "a b c".getBytes("UTF-8")
      .foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xffL)) * 0x100000001b3L)
    assert(m(1L) == want)
  }

  test("DotE12 matches an independent scala computation") {
    import s.implicits._
    val a = Array(0.5f, -0.25f, 0.125f)
    val b = Array(1.0f, 2.0f, -4.0f)
    val df = Seq((a, b)).toDF("a", "b").select(dotE12(col("a"), col("b")).as("d"))
    val want = a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong
    }.sum
    assert(df.head().getLong(0) == want)
  }

  test("native expressions: interpreted eval matches codegen") {
    import s.implicits._
    val df = Seq(("graft test string", Array(0.1f, -0.2f, 0.3f))).toDF("t", "v")
      .select(rollingHash64(col("t")).as("fp"), dotE12(col("v"), col("v")).as("d"))
    val withCodegen = df.collect().head
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.collect().head
      assert(withCodegen.getLong(0) == interpreted.getLong(0))
      assert(withCodegen.getLong(1) == interpreted.getLong(1))
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("misra-gries: heavy items survive eviction and cross-partition merge") {
    import s.implicits._
    import org.apache.spark.sql.functions.{col, udaf}
    // skewed stream: "a" x 1000, "b" x 400, 50 singletons; capacity 5
    val data = Seq.fill(1000)("a") ++ Seq.fill(400)("b") ++
      (1 to 50).map(i => s"rare_$i")
    val n = data.length
    val k = 5
    val ds = scala.util.Random.shuffle(data).toDF("tok").repartition(8)
    val mg = udaf(new graft.functions.MisraGries(k))
    val sketch = ds.agg(mg(col("tok"))).head().getAs[Map[String, Long]](0)
    assert(sketch.size <= k)
    // guarantee: every item with count > n/k present; estimates undercount
    // by at most n/k
    assert(sketch.contains("a") && sketch.contains("b"))
    assert(sketch("a") <= 1000 && sketch("a") >= 1000 - n / k)
    assert(sketch("b") <= 400 && sketch("b") >= 400 - n / k)
  }

  test("heavy_hitters output is exactly the brute-force groupBy+threshold") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextOps.heavyHitters(s, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(s, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val brute = toks.groupBy("tok").count()
      .filter(col("count") > lit(n) * lit(0.01))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == brute, s"sketch+verify must equal exact: ${out.size} vs ${brute.size}")
    assert(out.nonEmpty, "corpus should have heavy tokens at phi=0.01")
  }

  test("pii scrub: emails, phones, cards redacted; clean text untouched") {
    import s.implicits._
    val df = Seq(
      (1L, "contact me at alice.smith+work@example.co.uk for details"),
      (2L, "call 555-123-4567 or 555 987 6543 today"),
      (3L, "card 1234-5678-9012-3456 expires soon"),
      (4L, "no pii here, just words"),
      (5L, "two mails: a@b.io and c@d.org")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.operators.TextOps.scrubExpr(col("text")).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1) == "contact me at <EMAIL> for details")
    assert(out(2) == "call <PHONE> or <PHONE> today")
    assert(out(3) == "card <CARD> expires soon")
    assert(out(4) == "no pii here, just words")
    assert(out(5) == "two mails: <EMAIL> and <EMAIL>")
  }

  test("text_pii_scrub: counts agree with a direct recount of tags") {
    val rows = graft.operators.TextOps.textPiiScrub(s, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_redactions")
      assert(n >= 0)
      if (n > 0) assert(r.getAs[Boolean]("had_pii"))
    }
  }

  // ---------- multimodal: decode-from-bytes contract ----------
  // The spec carries its OWN GRMM parser (header offsets hand-written
  // from the format doc) so the operators are checked against an
  // independent reparse, not against MediaCodec's kernel.

  private def specParse(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'R' || b(2) != 'M' ||
        b(3) != 'M' || b(4) != 1) return None
    if (b(13) != (0 until 13).map(b(_) & 0xff).reduce(_ ^ _).toByte) return None
    val kind = b(5) & 0xff
    val w = ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    val h = ((b(8) & 0xff) << 8) | (b(9) & 0xff)
    val c = b(10) & 0xff
    val f = ((b(11) & 0xff) << 8) | (b(12) & 0xff)
    if (b.length - 14 != f * w * h * c) None else Some((kind, w, h, c, f))
  }

  test("mm_metadata: fields equal an independent byte-level reparse; corruption flips valid") {
    val payloads = MultimodalOps.mmSource(s, sf).collect()
      .map(r => r.doc_id -> r.payload).toMap
    val rows = MultimodalOps.mmMetadata(s, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val b = payloads(id)
      val Some((kind, w, h, c, f)) = specParse(b)
      assert(r.getAs[Boolean]("valid"))
      assert(r.getAs[Int]("kind") == kind && kind == (id % 3).toInt)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == c && r.getAs[Int]("n_frames") == f)
      assert(r.getAs[Long]("byte_len") == b.length.toLong)
      assert(r.getAs[Long]("body_len") == (b.length - 14).toLong)
      val sum = b.drop(14).map(_ & 0xff).map(_.toLong).sum
      assert(r.getAs[Double]("feat_mean") == sum.toDouble / (b.length - 14),
        "feat_mean must be the decoded body byte mean")
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(ow, oh) == 224, "aspect-fit must touch the target box")
      assert((ow, oh) == MultimodalOps.fitDims(w, h))
    }
    // corrupt one header byte → valid=false, zeroed dims (never a crash)
    import s.implicits._
    val good = payloads.head._2
    val bad = good.clone(); bad(2) = 'X'.toByte
    val badBody = good.clone()
    badBody(13) = (badBody(13) ^ 0x7f).toByte // checksum mismatch
    val out = Seq((1L, good), (2L, bad), (3L, badBody), (4L, Array[Byte](1, 2)))
      .toDF("id", "p")
      .select(col("id"), graft.functions.MediaCodec.mediaInfo(col("p")).as("m"))
      .select(col("id"), col("m.valid")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("mm_features: decoded from bytes — checksum changes when one payload byte changes") {
    val df = MultimodalOps.mmFeatures(s, sf)
    // harness contract: no array/struct/map columns (driver sorts via pandas)
    df.schema.fields.foreach { fld =>
      assert(!fld.dataType.typeName.matches("array|struct|map"),
        s"mm_features column ${fld.name} must be scalar, got ${fld.dataType}")
    }
    val rows = df.collect()
    assert(rows.length == 500)
    val payloads = MultimodalOps.mmSource(s, sf).collect()
      .map(r => r.doc_id -> r.payload).toMap
    rows.foreach { r =>
      val b = payloads(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("dim") == MultimodalOps.FeatureDim)
      val f = (0 until MultimodalOps.FeatureDim).map(i => r.getAs[Float](s"f$i")).toArray
      val n = math.sqrt(f.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"features must be L2-normalized, got $n")
      assert(r.getAs[Long]("feat_checksum") == MultimodalOps.featureChecksum(f),
        "checksum must be the FNV-1a of the e6-scaled components")
      // independent recompute from the raw body bytes
      val exp = new Array[Float](MultimodalOps.FeatureDim)
      for (i <- 14 until b.length)
        exp((i - 14) % MultimodalOps.FeatureDim) += (b(i) & 0xff) / 255.0f
      val en = math.sqrt(exp.map(x => x.toDouble * x).sum)
      val expN = if (en == 0) exp else exp.map(x => (x / en).toFloat)
      assert(f.sameElements(expN), "vector must equal the byte-level recompute")
    }
    // flip ONE body byte → different checksum; invalid container → dropped
    import s.implicits._
    val good = payloads.head._2
    val tweaked = good.clone()
    tweaked(14) = (tweaked(14) ^ 0x01).toByte
    val broken = good.clone(); broken(0) = 'X'.toByte
    val out = Seq((1L, good), (2L, tweaked), (3L, broken)).toDF("id", "p")
      .select(col("id"), graft.functions.MediaCodec.mediaFeatures(col("p")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("id"), col("m.checksum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L), "invalid container must be dropped")
    assert(out(1L) != out(2L), "one flipped body byte must change the checksum")
  }

  test("mm_frames: frame sums equal an independent byte-level recompute") {
    val rows = MultimodalOps.mmFrameSample(s, sf).collect()
    assert(rows.nonEmpty)
    val payloads = MultimodalOps.mmSource(s, sf).collect()
      .filter(_.media_type == "video").map(r => r.doc_id -> r.payload).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == payloads.keySet, "every (and only) video doc appears")
    byDoc.foreach { case (id, frames) =>
      val b = payloads(id)
      val Some((_, w, h, c, nf)) = specParse(b)
      val flen = w * h * c
      val expIdx = (0 until nf by graft.functions.MediaCodec.SampleEvery).toSeq
      assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq == expIdx)
      frames.foreach { fr =>
        val idx = fr.getAs[Int]("frame_idx")
        assert(fr.getAs[Long]("frame_len") == flen.toLong)
        val exp = (14 + idx * flen until 14 + (idx + 1) * flen)
          .map(b(_) & 0xff).map(_.toLong).sum
        assert(fr.getAs[Long]("frame_sum") == exp,
          s"doc $id frame $idx sum must equal the byte-level recompute")
      }
    }
  }
}
