package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RetrievalIndexOps, RetrievalOps, TextOps}

/** The landed text index's ADAPTIVE plane sizing (round 11): the build
  * job sizes LSH planes from the corpus count, lands the count as
  * `meta/`, and every read path — probe, admission, compaction, the
  * health panel — honors the landed count rather than the keyed
  * default. Proven at 8 planes (a corpus the fixed-6 default would
  * under-bucket), the exact configuration the keyed queries never
  * exercise. */
class AdaptivePlanesSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_adapt_$tag").toString

  // 20 000 three-token docs: adaptivePlanes(20000) = 8 (128·2^7 = 16384
  // < 20000 ≤ 32768 = 128·2^8). Odd token count per doc means the ±1
  // sign sums can never fully cancel, so every doc has a nonzero-norm
  // vector and built_docs is exactly the corpus size.
  private lazy val docs = {
    s.range(0L, 20000L).toDF("doc_id")
      .select(col("doc_id"), concat_ws(" ",
        concat(lit("w"), col("doc_id") % 499L),
        concat(lit("x"), (col("doc_id") * 7L + 1L) % 499L),
        concat(lit("u"), col("doc_id"))).as("text"))
  }

  test("adaptivePlanes: exact integer ceil-log2, floored at DocPlanes") {
    assert(TextOps.adaptivePlanes(1L) === TextOps.DocPlanes)
    assert(TextOps.adaptivePlanes(500L) === TextOps.DocPlanes)
    assert(TextOps.adaptivePlanes(5000L) === TextOps.DocPlanes) // sf0.1
    assert(TextOps.adaptivePlanes(128L << 6) === TextOps.DocPlanes)
    assert(TextOps.adaptivePlanes((128L << 6) + 1L) === 7)
    assert(TextOps.adaptivePlanes(20000L) === 8)
    assert(TextOps.adaptivePlanes(1000000000L) === 23)
  }

  test("build lands the adaptive plane count and 8-plane bucket layout") {
    val idx = freshDir("build")
    RetrievalIndexOps.buildRetrievalIndex(s, docs, idx)
    s.catalog.clearCache()
    val (planes, built) = RetrievalIndexOps.readMeta(s, idx)
    assert(planes === 8)
    assert(built === 20000L)
    // the layout really is 8-plane: bucket ids beyond the 6-plane range
    // [0, 64) exist, and all sit inside [0, 256)
    val buckets = s.read.parquet(s"$idx/buckets")
      .select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0L && b < 256L))
    assert(buckets.exists(_ >= 64L))

    // the probe MASKS the landed count: its dense leg equals the inline
    // 8-plane composition frame-for-frame (a probe masking 6 planes
    // against this index would miss buckets by construction)
    val (dense, _) = RetrievalIndexOps.probeLegs(s, idx)
    val inline8 = TextOps.docNeighborsLshFromVectors(
      TextOps.docNeighborVectorsOf(docs), RetrievalOps.PoolK,
      TextOps.DocProbeBits, 8)
    val got = dense.collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rnk"))).toSet
    val want = inline8.collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rnk"))).toSet
    assert(got === want)
    s.catalog.clearCache()
  }

  test("admission and compaction honor the landed 8-plane count") {
    val idx = freshDir("admit")
    RetrievalIndexOps.buildRetrievalIndex(s, docs, idx)
    s.catalog.clearCache()
    import s.implicits._
    val batch = Seq(
      (30000L, "w3 x22 u30000"), (30100L, "w7 x50 u30100"))
      .toDF("doc_id", "text")
    assert(RetrievalIndexOps.admitToRetrievalIndex(s, idx, batch) === 2L)
    s.catalog.clearCache()
    // the admitted vectors' landed bucket ids equal the 8-plane hash of
    // their vectors — not the 6-plane default
    val landed = s.read.parquet(s"$idx/buckets")
      .filter(col("doc_id") >= 30000L)
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"))
    val expect = TextOps.docNeighborVectorsOf(batch)
      .select(col("doc_id"),
        TextOps.docLshBucketN(col("v"), 8).as("bucket"))
    assert(landed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      expect.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // the health panel reports the landed sizing
    val stats = RetrievalIndexOps.retrievalIndexStatsOf(s, idx, batch)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(stats("planes") === 8L)
    assert(stats("built_docs") === 20000L)

    // compaction folds the fragmented artifacts and changes nothing:
    // probe frames identical before and after
    val before = RetrievalIndexOps.probeRetrievalIndex(s, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rrf_e6"), r.getAs[Long]("rnk"))).toSet
    assert(RetrievalIndexOps.compactRetrievalIndex(s, idx) >= 1)
    s.catalog.clearCache()
    val after = RetrievalIndexOps.probeRetrievalIndex(s, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rrf_e6"), r.getAs[Long]("rnk"))).toSet
    assert(after === before)
    s.catalog.clearCache()
  }
}
