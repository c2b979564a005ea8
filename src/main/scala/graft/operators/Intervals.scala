package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed integer ranges — the classic gaps-and-
  * islands computation, done with two stacked windows over ONE exchange.
  *
  * Used by q_dup_spans to turn per-position duplicated-k-gram hits into
  * maximal verbatim-duplicated REGIONS (what an ExactSubstr-style cutter
  * actually removes), but the operator is generic: sessionizing time
  * ranges, coalescing IP blocks, merging annotation spans.
  */
object Intervals {

  /** Merge overlapping-or-touching intervals `[start, end]` (inclusive
    * ends, integer coordinates) per key: any interval starting at or
    * before the running maximum end + 1 of its predecessors (in start
    * order) joins their island; otherwise it opens a new one. Emits one
    * row per merged island: (key, span_start, span_end).
    *
    * Exact and deterministic — island boundaries are a function of the
    * set alone (start order with any tie produces the same running max),
    * so any engine computes the identical spans.
    *
    * Scale: both windows share the same (key, start) partitioning — one
    * hash exchange, linear per-key scan — and the island fold is one
    * partial-aggregated exchange on (key, island). The running max must
    * be over rows UNBOUNDED PRECEDING to the PREVIOUS row (an interval
    * never joins an island via an interval that starts after it). */
  def mergeIntervals(df: DataFrame, keyCol: String,
      start: Column, end: Column): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(start.asc, end.asc)
    val prevMaxEnd = max(end).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val opened = df
      .withColumn("__new_island",
        when(start > prevMaxEnd + 1 || prevMaxEnd.isNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("__island",
        sum(col("__new_island")).over(byStart))
    opened.groupBy(col(keyCol), col("__island"))
      .agg(min(start).as("span_start"), max(end).as("span_end"))
      .drop("__island")
  }
}
