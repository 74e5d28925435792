package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-corpus text analysis (SURVEY.md §2.11 extension surface):
  * token statistics, quality scoring, language ID, fingerprints.
  *
  * Input contract: a DataFrame with (`idCol`: long, `textCol`:
  * string). All outputs are per-row projections — no shuffle, scan
  * parallel at any scale.
  */
object TextAnalysis {

  /** Token statistics: count, distinct count, alnum char mass,
    * BPE-ish subword count. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    // counts cast to long: the DuckDB oracle's len() yields BIGINT
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
      alnumChars(toks).cast("long").as("alnum_chars"),
      bpeishTokenCount(col(textCol)).cast("long").as("n_bpeish"))
  }

  /** Quality signals: length, punctuation ratio, stopword ratio, mean
    * token length, and a blended [0,1]-ish score. Ratios are rounded
    * to 6 decimals for cross-engine comparability. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / nullifZero(nChar)
    val stopRatio = stopwordCount(toks, StopEn).cast("double") / nullifZero(nTok)
    val avgTokLen = alnumChars(toks).cast("double") / nullifZero(nTok)
    // blended heuristic: long-enough docs with some stopwords and
    // moderate punctuation score high (weights arbitrary but fixed)
    val score = least(nChar / lit(500.0), lit(1.0)) * lit(0.4) +
      least(coalesce(stopRatio, lit(0.0)) * lit(5.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - least(coalesce(punctRatio, lit(0.0)) * lit(10.0), lit(1.0))) * lit(0.2)
    docs.select(
      col(idCol),
      length(text).cast("long").as("n_chars"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(avgTokLen, 6).as("avg_token_len"),
      round(score, 6).as("quality"))
  }

  /** Stopword-heuristic language identification. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol), langId(col(textCol)).as("predicted_lang"))

  /** Content fingerprints (md5 + 60-bit key) of normalized text. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("fp_md5"),
      fingerprint64(col(textCol)).as("fp64"))

  /** TF-IDF (SURVEY.md §2.11): tf = term frequency within the doc;
    * idf = ln((N+1)/(df+1)).
    *
    * Scale shape: ONE tokenize + (doc, term) aggregation, then doc
    * lengths and document frequencies as window aggregations over
    * that same relation — two shuffles of the (already reduced) tf
    * table, zero persists, zero extra scans of the corpus. (The
    * round-1 shape cached tf and re-joined two aggregations of it —
    * same shuffle count, but it pinned the vocabulary-sized relation
    * in executor memory and leaked it past the operator's return.) */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    // corpus size as a lazy broadcast scalar — no eager driver job
    val nDf = broadcast(docs.agg(
      countDistinct(col(idCol)).cast("double").as("_n")))
    tf
      .withColumn("doc_len", sum("tf").over(wDoc))
      .withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(nDf)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round((col("tf").cast("double") / col("doc_len")) *
          log((col("_n") + 1.0) / (col("df").cast("double") + 1.0)), 6)
          .as("tfidf"))
  }

  private def nullifZero(c: org.apache.spark.sql.Column) =
    when(c === 0, lit(null)).otherwise(c)
}
