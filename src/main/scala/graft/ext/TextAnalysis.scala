package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Document-corpus profiling: per-doc quality/token metrics, language-ID,
  * fingerprints — the text-analysis slice of a training-data pipeline.
  * All column expressions (graft.functions.TextFunctions), so each profile
  * is a single codegen'd scan. */
object TextAnalysis {

  /** Per-document metrics table. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      T.tokenCount(t).cast("long").as("n_tokens"),
      T.bpeishTokenCount(t).cast("long").as("n_bpeish_tokens"),
      T.punctRatio(t).as("punct_ratio"),
      T.digitRatio(t).as("digit_ratio"),
      T.upperRatio(t).as("upper_ratio"),
      T.meanTokenLen(t).as("mean_token_len"),
      T.stopwordRatio(t).as("stopword_ratio"),
      T.qualityScore(t).as("quality_score"))
  }

  /** Language-ID predictions: (id, lang_pred, …per-language scores). */
  def detectLanguage(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), T.langId(col(textCol)).as("lang_pred"))

  /** Stable content fingerprints (md5-of-normalized + rolling hash). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      T.fingerprint(col(textCol)).as("fingerprint"),
      T.rollingHash(col(textCol)).as("rolling_hash"))

  /** Corpus-level aggregate: per-language token/char/doc counts. */
  def corpusStats(df: DataFrame, langCol: String, textCol: String): DataFrame =
    df.groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"),
        sum(T.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
}
