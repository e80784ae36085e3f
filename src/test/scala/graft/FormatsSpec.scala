package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SteamOps
import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("iso lookup round-trips through CSV with explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val iso = SteamOps.isoDim(s, sf)
    Formats.writeCsv(iso, s"$tmp/iso")
    val schema = StructType(Seq(
      StructField("iso_a2", StringType), StructField("iso_a3", StringType)))
    val back = Formats.readCsv(s, s"$tmp/iso", schema)
    assert(back.count() == iso.count())
    assert(back.collect().map(_.toString).sorted.toSeq ==
      iso.collect().map(_.toString).sorted.toSeq)
  }

  test("documents round-trip through JSON lines with explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(s, sf).select("doc_id", "text", "lang")
    Formats.writeJsonl(docs, s"$tmp/docs")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Formats.readJsonl(s, s"$tmp/docs", schema)
    assert(back.count() == 500)
    assert(back.selectExpr("sum(doc_id)").head().getLong(0) ==
      docs.selectExpr("sum(doc_id)").head().getLong(0))
  }
}
