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
}
