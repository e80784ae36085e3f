package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Keyword retrieval over the documents table — the search side of a
  * training-data / RAG pipeline (the reference's query surface has no
  * search operator; this is part of the LLM-data widening).
  *
  * Shape at scale: per-document term frequencies come from codegen'd
  * array lambdas over ONE split of the text (no explode, no shuffle);
  * corpus statistics (N, total length, per-term document frequencies)
  * ride a SINGLE single-row aggregation that is broadcast-crossed back;
  * the global top-k is TakeOrderedAndProject (per-partition heads + one
  * k-row merge), never a full sort. So a 100 TB corpus is scored in one
  * scan with one k-sized driver merge.
  */
object RetrievalOps {

  /** Fixed query for the oracle-checked entry (terms exist corpus-wide). */
  val QueryTerms: Seq[String] = Seq("spark", "vector", "query")
  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  /** bm25_topk — BM25 ranking of all documents against [[QueryTerms]],
    * top-[[TopK]] with a doc_id tie-break.
    *
    * Determinism contract (same as text_tfidf): the ln-free BM25 idf
    * variant (N − df + 0.5)/(df + 0.5) keeps every input an exact
    * integer (plus exactly-representable 0.5/0.75 constants), and the
    * double chain is written with IDENTICAL association in the DuckDB
    * oracle, so scores hash-compare bit-identically — a transcendental
    * ln idf would be libm-specific. */
  def bm25Topk(s: SparkSession, dir: String, k: Int = TopK): DataFrame =
    bm25Docs(Tables.documents(s, dir), k)

  /** Core on any documents-shaped frame (testable / probe-able). */
  def bm25Docs(docs: DataFrame, k: Int = TopK): DataFrame = {
    // materialize the split ONCE as a column (the winnowing lesson:
    // expressions referenced inside array lambdas are re-evaluated per
    // element if left as expressions)
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
    val tfCols = QueryTerms.map(t =>
      size(filter(col("w"), y => y === t)).cast("long").as(s"tf_$t"))
    val perDoc = base.select(col("doc_id") +: col("dl") +: tfCols: _*)

    // ONE single-row aggregation carries every corpus statistic
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
      QueryTerms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    val dlNorm = col("dl").cast("double") / (col("sumdl").cast("double") / col("n"))
    def termScore(t: String) =
      (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) *
        (col(s"tf_$t") * lit(K1 + 1)) /
        (col(s"tf_$t") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * dlNorm))
    val score = QueryTerms.map(termScore).reduceLeft(_ + _)

    val top = perDoc.join(broadcast(stats))
      .select(col("doc_id") +: col("dl") +: QueryTerms.map(t => col(s"tf_$t")) :+
        score.as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // ranking the k survivors: a k-row single partition, not the corpus
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .orderBy("rnk")
  }
}
