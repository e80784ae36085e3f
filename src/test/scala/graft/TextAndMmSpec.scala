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

  test("mm_metadata: byte_len matches text length, batched decode is total") {
    val rows = MultimodalOps.mmMetadata(s, sf).collect()
    assert(rows.length == 500)
    val chars = Tables.documents(s, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    rows.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
      assert(r.getAs[Long]("byte_len") == chars(r.getAs[Long]("doc_id")),
        "ascii payload byte_len must equal n_chars")
      assert(r.getAs[Double]("feat_mean") >= 0)
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(ow, oh) == 224, "aspect-fit must touch the target box")
      assert(ow >= 1 && oh >= 1 && ow <= 224 && oh <= 224)
    }
  }

  test("mm_features: fixed-dim unit vectors, one per document, all-scalar output") {
    val df = MultimodalOps.mmFeatures(s, sf)
    // harness contract: no array/struct/map columns (driver sorts via pandas)
    df.schema.fields.foreach { fld =>
      assert(!fld.dataType.typeName.matches("array|struct|map"),
        s"mm_features column ${fld.name} must be scalar, got ${fld.dataType}")
    }
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("dim") == MultimodalOps.FeatureDim)
      val f = (0 until MultimodalOps.FeatureDim).map(i => r.getAs[Float](s"f$i")).toArray
      val n = math.sqrt(f.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"features must be L2-normalized, got $n")
      assert(r.getAs[Long]("feat_checksum") == MultimodalOps.featureChecksum(f),
        "checksum must be the FNV-1a of the e6-scaled components")
    }
  }

  test("mm_frames: sampled frame indices, lengths bounded by frame size") {
    val rows = MultimodalOps.mmFrameSample(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % MultimodalOps.SampleEvery == 0)
      val len = r.getAs[Long]("frame_len")
      assert(len >= 1 && len <= MultimodalOps.FrameBytes)
    }
    // every video doc with a payload appears
    val videoDocs = Tables.documents(s, sf)
      .filter(org.apache.spark.sql.functions.expr("doc_id % 3 = 2"))
      .count()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == videoDocs)
  }
}
