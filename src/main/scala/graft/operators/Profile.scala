package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot dataset drift: the data-quality report a curation
  * pipeline runs when a new crawl/export lands — did a column's null
  * rate jump, did its cardinality collapse, did values get longer? —
  * BEFORE the new snapshot is allowed into training. Complements
  * q_snapshot_diff (row-level added/removed/changed) and q_drift_psi
  * (distribution shift of one metric) with a per-COLUMN structural view.
  */
object Profile {

  /** One row per column: rows, nulls, exact distincts and mean rendered
    * length, all over the column's STRING rendering (one unpivot scan —
    * the q_column_profile idiom — so 50 columns still cost one pass).
    * Exact `countDistinct` is the oracle-checkable form; at 100 TB swap
    * `approx_count_distinct` in the same slot (the unpivot shape and the
    * drift join are unchanged — only the agg function differs). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val p = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    p.unpivot(Array.empty[Column], cols.map(col).toArray, "col_name", "value")
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, lit(1L)).otherwise(lit(0L))).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"),
        avg(length(col("value"))).as("avg_len"))
  }

  /** Per-column drift between two snapshots of the same table: both
    * profiles (one scan each), joined on column name — a |cols|-row
    * frame, so the join is a broadcast no-op. Rate deltas are IEEE
    * long/long divisions (engine-portable); `n_distinct` deltas stay
    * integer. A column missing from either side would surface as a null
    * row via the full outer join — schema drift is part of the report,
    * not an error. */
  def profileDrift(prev: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame = {
    val a = columnProfile(prev, cols).select(
      col("col_name"), col("n_rows").as("prev_rows"),
      col("n_nulls").as("prev_nulls"), col("n_distinct").as("prev_distinct"),
      col("avg_len").as("prev_avg_len"))
    val b = columnProfile(cur, cols).select(
      col("col_name"), col("n_rows").as("cur_rows"),
      col("n_nulls").as("cur_nulls"), col("n_distinct").as("cur_distinct"),
      col("avg_len").as("cur_avg_len"))
    a.join(b, Seq("col_name"), "full_outer")
      .select(col("col_name"),
        col("prev_rows"), col("cur_rows"),
        col("prev_nulls"), col("cur_nulls"),
        (col("cur_nulls") / col("cur_rows").cast("double") -
          col("prev_nulls") / col("prev_rows").cast("double")).as("null_rate_delta"),
        col("prev_distinct"), col("cur_distinct"),
        (col("cur_distinct") - col("prev_distinct")).as("distinct_delta"),
        (col("cur_avg_len") - col("prev_avg_len")).as("avg_len_delta"))
  }
}
