package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Property tests (scalacheck generators, plain scalatest driver) pinning
  * the native CharStats/WordStats expressions to their `functions._` fold
  * twins over adversarial random text: multi-space runs, leading/trailing
  * spaces, empty strings, non-ASCII, surrogate pairs, and heavy repetition
  * — the full tokenization contract, not just the happy path. */
class NativeTextPropertySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("a", "b", "ab", "", "é", "日本", "😀", "x y".take(1)),
    Gen.stringOfN(1, Gen.alphaNumChar))

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, tokenGen)
    sep <- Gen.oneOf(" ", "  ", " ")
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ", "  ")
  } yield lead + toks.mkString(sep) + trail

  test("WordStats == fold twin on 200 random docs (spaces, unicode, empties)") {
    import s.implicits._
    val docs = Gen.listOfN(200, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = TextOps.repetitionStatsDocs(docs).collect().map(_.toSeq)
    val fold = TextOps.repetitionStatsDocsFold(docs).collect().map(_.toSeq)
    assert(native.length == 200)
    assert(native.toSeq == fold.toSeq)
  }

  test("CharStats == fold twin on 200 random docs") {
    import s.implicits._
    val docs = Gen.listOfN(200, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = TextOps.charDiversityDocs(docs).collect().map(_.toSeq)
    val fold = TextOps.charDiversityDocsFold(docs).collect().map(_.toSeq)
    assert(native.length == 200)
    assert(native.toSeq == fold.toSeq)
  }
}
