package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline evaluation of a binary scorer over a labeled dataset — the
  * report a data-curation team reads before trusting a quality/dedup/
  * toxicity classifier at 100 TB: exact tie-aware ROC AUC plus the
  * confusion counts and derived rates at an operating threshold.
  *
  * Exactness contract: AUC is the Mann-Whitney U statistic computed
  * ENTIRELY in integers — per distinct score s, positives p(s) pair with
  * the negatives strictly below (concordant) and split ties in half:
  *
  *   num = Σ_s 2·p(s)·negBelow(s) + p(s)·n(s),   AUC = num / (2·n1·n0)
  *
  * one IEEE division at the end, so any engine replays it bit-for-bit —
  * no float rank sums, no summation-order contract.
  *
  * Scale shape: one grouped aggregation to the per-distinct-score frame
  * (map-side combined), then the cumulative-negatives step as a
  * broadcast range join of that SMALL frame against itself — bounded by
  * SCORE-DOMAIN cardinality, not rows (a continuous score gets bucketed
  * first, the standard calibration-curve move; the raw rows are never
  * self-joined). No global window, no single-partition stage. */
object Evaluation {

  def binaryClassifierReport(df: DataFrame, labelCol: Column, scoreCol: Column,
      threshold: Column): DataFrame = {
    val rows = df.select(labelCol.cast("boolean").as("y"),
      scoreCol.as("s"), (scoreCol >= threshold).as("pred"))
    // confusion counts at the operating threshold — one scan
    val conf = rows.agg(
      sum(when(col("y") && col("pred"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("y") && col("pred"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") && !col("pred"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("y") && !col("pred"), 1L).otherwise(0L)).as("tn"))
    // per-distinct-score positives/negatives — the AUC working frame
    val byScore = rows.groupBy(col("s")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("p"),
      sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    val below = byScore.as("a")
      .join(broadcast(byScore.select(col("s").as("s2"), col("n").as("n2"))),
        col("s2") < col("a.s"), "left")
      .select(col("a.s").as("s"), col("a.p").as("p"), col("a.n").as("n"), col("n2"))
      .groupBy(col("s"), col("p"), col("n"))
      .agg(coalesce(sum(col("n2")), lit(0L)).as("neg_below"))
    val auc = below.agg(
      sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
      sum(col("p") * col("neg_below") * 2 + col("p") * col("n")).as("auc_num"))
    conf.crossJoin(broadcast(auc)).select(
      col("n_pos"), col("n_neg"), col("tp"), col("fp"), col("fn"), col("tn"),
      (col("auc_num").cast("double") /
        (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"),
      (col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("precision"),
      (col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).as("recall"),
      ((col("tp") * 2).cast("double") /
        (col("tp") * 2 + col("fp") + col("fn")).cast("double")).as("f1"))
  }
}
