package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) maintenance of algebraic aggregates.
  *
  * At 100 TB the history is scanned ONCE, ever: keep the per-key
  * aggregation STATE (counts, exact long sums, mins, maxes) as a table and
  * fold each new delta batch into it — the merge works on state rows
  * (one per key), not raw rows, so maintenance cost tracks the key
  * cardinality and the delta size, never the history size.
  *
  * Only ALGEBRAIC aggregates merge this way (sum/count via sum, min via
  * min, max via max; avg as a sum/count pair). Holistic aggregates
  * (exact percentiles, distinct counts) need sketch states instead —
  * HLL/KLL columns merge the same shape, with bounded error.
  *
  * Exactness contract: double sums are order-dependent, so a mergeable
  * money sum must be carried as INTEGER cents (the repo-wide `cents`
  * pattern) — merging long sums is exact and engine-independent, which is
  * what lets the oracle verify `merge(history, delta) == recompute(all)`
  * bit-for-bit. */
object Incremental {

  /** Merge per-key aggregation states. Every input frame carries `keys`
    * plus the state columns named in `ops`; `ops` maps each state column
    * to its merge function: "sum" (counts and long sums), "min", "max".
    * One union + one map-combined exchange over state rows. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String],
      ops: Seq[(String, String)]): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    val aggs = ops.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, op) => throw new IllegalArgumentException(
        s"non-algebraic merge op '$op' for column '$c' — only sum/min/max " +
          "states merge exactly; use a sketch state for holistic aggregates")
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Mergeable state for EXACT holistic aggregates over a DISCRETE value
    * domain: the per-(key, value) count table. Unlike a sketch state this
    * is exact — any rank statistic (median, any quantile, mode) recomputes
    * losslessly from the merged counts — and it merges with plain count
    * addition, so [[mergeStates]] with one "sum" op folds a delta batch in
    * at cost ∝ |keys| × |domain|, never the history size. The state is
    * bounded by the DISTINCT value count per key (l_quantity: 50); for
    * continuous domains use a sketch (KLL/approx_percentile) instead —
    * same pipeline shape, bounded error. */
  def valueCountState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-key linear-interpolated quantile (quantile_cont semantics: rank
    * position p = (n-1)·q, result = v_lo + frac·(v_hi - v_lo)) computed
    * from a value-count state — one window pass over STATE rows (already
    * key-partitioned and tiny relative to the raw data), no re-scan of
    * history. Values at 0-based rank r satisfy cum - cnt <= r < cum. */
  def quantileFromCounts(state: DataFrame, keys: Seq[String], valueCol: String,
      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val ranked = state
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .withColumn("__p", (col("__n") - lit(1L)).cast("double") * lit(q))
      .withColumn("__lo", floor(col("__p")).cast("long"))
      .withColumn("__hi", ceil(col("__p")).cast("long"))
    ranked.groupBy(keys.map(col): _*)
      .agg(
        min(when(col("__cum") > col("__lo"), col(valueCol))).cast("double").as("__vlo"),
        min(when(col("__cum") > col("__hi"), col(valueCol))).cast("double").as("__vhi"),
        min(col("__p") - floor(col("__p"))).as("__frac"))
      .select((keys.map(col) :+
        (col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo")))
          .as("quantile")): _*)
  }
}
