package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, Wordpiece}
import graft.operators.TokenizerOps

/** Round 11: greedy MaxMatch (WordPiece-inference) segmentation vs the
  * BPE fold under one learned vocabulary. The planted divergence test is
  * the load-bearing one: it proves the two segmenters are genuinely
  * different rules, so corpus-wide equality (wp_vs_bpe_e6 == 1e6) is a
  * measured finding, not a tautology. */
class Round11dOpsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  private def seg(word: String, vocab: Seq[String]): Array[String] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val buckets = Array.fill(maxLen)(new java.util.HashSet[String]())
    vocab.foreach(t => if (t.nonEmpty) buckets(t.length - 1).add(t))
    Wordpiece.segment(word, buckets)
  }

  test("wordpiece: greedy picks the longest match, not the first") {
    assert(seg("abc", Seq("a", "b", "c", "ab", "abc")).toSeq === Seq("abc"))
    assert(seg("abcd", Seq("a", "b", "c", "d", "ab", "abc")).toSeq
      === Seq("abc", "d"))
  }

  test("wordpiece: uncovered characters fall back to themselves") {
    assert(seg("axb", Seq("a", "b")).toSeq === Seq("a", "x", "b"))
    assert(seg("", Seq("a")).toSeq === Seq.empty)
  }

  test("wordpiece diverges from the BPE fold on a planted vocabulary") {
    val merges = Array(("b", "a"), ("a", "b"))
    // BPE fold: round (b,a) turns a|b|a|b into [a, ba, b]; round (a,b)
    // finds no adjacency -> 3 tokens
    assert(Bpe.encodeWord("abab", merges).toSeq === Seq("a", "ba", "b"))
    // greedy over the SAME derived vocab {a,b} ∪ {ba,ab}: ab|ab -> 2
    val vocab = Seq("a", "b") ++ merges.map { case (l, r) => l + r }
    assert(seg("abab", vocab).toSeq === Seq("ab", "ab"))
  }

  test("WordpieceEncode expression: codegen path matches the Scala kernel") {
    val spark = s; import spark.implicits._
    val vocab = Seq("a", "b", "c", "ab", "abc", "bc")
    val words = Seq("abcabc", "cab", "bca", "x").toDF("w")
    val got = words
      .select(col("w"), Wordpiece.wordpieceEncode(col("w"), vocab).as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq)).toMap
    words.collect().map(_.getString(0)).foreach { w =>
      assert(got(w) === seg(w, vocab).toSeq, s"word $w")
    }
    assert(got("abcabc") === Seq("abc", "abc"))
    assert(got("x") === Seq("x"))
  }

  test("wordpiece_tokens keyed run: bounds, ratio arithmetic, bpe consistency") {
    val rows = TokenizerOps.wordpieceTokens(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nWords, nWp, nBpe, ratio) =>
      assert(nWords >= 1L)
      assert(nWp >= nWords, "every word segments to >= 1 wp token")
      assert(nBpe >= nWords, "every word folds to >= 1 bpe token")
      assert(ratio === nWp * 1000000L / nBpe)
    }
    // the BPE column is the same count bpe_tokens publishes
    val bpe = TokenizerOps.bpeTokens(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (docId, _, _, nBpe, _) =>
      assert(bpe(docId) === nBpe, s"doc $docId")
    }
  }
}
