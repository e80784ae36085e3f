package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharStats, DotE12, MinHash32, RollingHash64, SimHash64, WordStats}

/** SparkSessionExtensions entry point: exposes graft's native codegen
  * expressions to SQL users and installs the key-less interval-join
  * rewrite ([[graft.plans.RangeJoinRule]]).
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT graft_dot_e12(a.embedding, b.embedding) ...")
  *   spark.sql("SELECT graft_rolling_hash64(text) ...")
  *   spark.sql("SELECT * FROM pts JOIN ivals ON t >= lo AND t < hi") // no BNLJ
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot_e12"),
      info("graft_dot_e12",
        "graft_dot_e12(a, b) - exact scaled-int (1e12) dot product of two float arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot_e12 takes 2 arguments, got ${args.length}")
        DotE12(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash64"),
      info("graft_rolling_hash64",
        "graft_rolling_hash64(s) - 64-bit FNV-1a rolling fingerprint of a string"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_rolling_hash64 takes 1 argument, got ${args.length}")
        RollingHash64(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(s) - 64-bit SimHash of a whitespace-tokenized string"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_simhash64 takes 1 argument, got ${args.length}")
        SimHash64(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_minhash32"),
      info("graft_minhash32",
        "graft_minhash32(s) - array of 32 MinHash slots over word-3-gram shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_minhash32 takes 1 argument, got ${args.length}")
        MinHash32(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_char_stats"),
      info("graft_char_stats",
        "graft_char_stats(s) - struct(n, distinct, sumsq) char-distribution moments in one pass"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_char_stats takes 1 argument, got ${args.length}")
        CharStats(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_word_stats"),
      info("graft_word_stats",
        "graft_word_stats(s) - struct(words_n, uniq_words, top_word_n, bigrams_n, uniq_bigrams) repetition moments in one pass"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_word_stats takes 1 argument, got ${args.length}")
        WordStats(args.head)
      }))
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
