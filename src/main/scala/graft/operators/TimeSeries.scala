package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-series operators over keyed event streams: the EWMA smoother
  * and the rolling z-score monitor every metrics pipeline runs.
  *
  * Both are built so the SEQUENTIAL recurrence disappears: a naive
  * implementation folds each key's series in order (driver loop or UDAF —
  * not distributed, not oracle-replayable); these express the same math as
  * one window pass + one aggregation, a single key-hash exchange.
  */
object TimeSeries {

  /** EWMA y_n = α·x_n + (1−α)·y_{n−1} (y_1 = x_1) evaluated at each key's
    * LAST point, via the closed weighted-sum form
    * y_n = Σ_{i>1} α(1−α)^{n−i}·x_i + (1−α)^{n−1}·x_1 — the recurrence
    * unrolled, so no sequential dependency survives: one row_number/count
    * window + one sum, all on the same key exchange.
    *
    * Determinism contract: with α = 1/2 every weight is a power of two, so
    * pow() and each per-term product are EXACT IEEE doubles in any engine;
    * only the final sum's addition order varies, which `round(·, 6)`
    * absorbs (error ~1e-13 on fixture magnitudes). Other α values remain
    * correct but the oracle-side pow() may differ in the last ulp. */
  def ewmaLast(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wAll = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__wt",
        when(col("__rn") === 1, pow(lit(1.0d - alpha), col("__n") - 1))
          .otherwise(pow(lit(1.0d - alpha), col("__n") - col("__rn")) * lit(alpha)))
      .groupBy(keys.map(col): _*)
      .agg(round(sum(value * col("__wt")), 6).as("ewma"),
        max(col("__n")).as("n_points"))
  }

  /** Rolling z² anomaly statistic over a keyed ordered series of LONG
    * counts: for each point, z² against the trailing `lookback`-row window
    * (inclusive), computed as the fraction-free identity
    * z² = (n·x − S)² / (n·Q − S²) — counts, sums and squares stay integers
    * until ONE final IEEE division, so the statistic is bit-exact
    * cross-engine with no rounding contract at all. Rows with fewer than
    * `minPoints` in the window or zero variance are dropped (a constant
    * window has no z-score). Flag threshold is on z², i.e. `zThreshold`²
    * in z units — note the point under test sits INSIDE its own trailing
    * window, which bounds z² ≤ n−1: a threshold of z = 2 needs at least
    * 6 points in-window to be reachable (hence the minPoints default).
    * Overflow bound: |n·Q| ≤ lookback²·max(x)² — fine for counts to ~10⁸
    * at lookback 24. */
  def rollingAnomaly(counts: DataFrame, keys: Seq[String], order: Column,
      value: Column, lookback: Int = 24, minPoints: Int = 12,
      zThreshold: Double = 2.0): DataFrame = {
    require(lookback >= 2 && minPoints >= 2 && minPoints <= lookback,
      s"need 2 <= minPoints <= lookback, got minPoints=$minPoints lookback=$lookback")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(-(lookback - 1), 0)
    val x = col("__x")
    val num = (col("__n") * x - col("__sx")) * (col("__n") * x - col("__sx"))
    val den = col("__n") * col("__sq") - col("__sx") * col("__sx")
    counts
      .withColumn("__x", value.cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sq", sum(x * x).over(w))
      .where(col("__n") >= minPoints && den =!= 0)
      .withColumn("z2", num.cast("double") / den)
      .withColumn("is_anomaly", col("z2") > lit(zThreshold * zThreshold))
      .drop("__x", "__n", "__sx", "__sq")
  }
}
