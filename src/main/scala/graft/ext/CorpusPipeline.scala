package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Normalize
import graft.functions.{TextFunctions => T}

/** The composite training-data cleaning pipeline — the operators of this
  * engine composed the way a 100 TB corpus prep actually runs:
  *
  *   sanitize → quality filter → exact dedup → near-dup cluster removal
  *
  * Each stage is the already-scale-shaped operator (single scan, bounded
  * LSH shuffle, GraphX transitive closure on the tiny pair set); the
  * composition adds no extra shuffles beyond the stages' own.
  */
object CorpusPipeline {

  /** Keep documents whose heuristic quality score clears `minQuality`. */
  def filterByQuality(df: DataFrame, textCol: String, minQuality: Double): DataFrame =
    df.where(T.qualityScore(col(textCol)) >= minQuality)

  /** Full cleaning pass; returns the cleaned corpus. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.2,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16,
      nearDupThreshold: Double = 0.8): DataFrame = {
    val sanitized = Normalize.sanitizeStrings(docs)
    val quality = filterByQuality(sanitized, textCol, minQuality)
    val exact = Dedup.exactDedup(quality, idCol, Seq(textCol))
    val pairs = Dedup.minhashNearDuplicates(
      exact, idCol, textCol, shingleSize, numHashes, bands, nearDupThreshold)
    Dedup.dropNearDuplicates(exact, idCol, pairs)
  }

  /** Per-stage survivor counts — the funnel report a pipeline run logs. */
  def funnel(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.2,
      nearDupThreshold: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sanitized = Normalize.sanitizeStrings(docs)
    val quality = filterByQuality(sanitized, textCol, minQuality)
    val exact = Dedup.exactDedup(quality, idCol, Seq(textCol))
    val cleaned = clean(docs, idCol, textCol, minQuality = minQuality,
      nearDupThreshold = nearDupThreshold)
    Seq(
      ("0_input", docs.count()),
      ("1_quality", quality.count()),
      ("2_exact_dedup", exact.count()),
      ("3_near_dedup", cleaned.count())
    ).toDF("stage", "n_docs")
  }
}
