package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has heavy
  * hitters. AQE's skew-join handles sort-merge skew at runtime; explicit
  * salting is for the cases AQE can't touch (broadcast-ineligible
  * dimension joins against a hot key, pre-AQE plans, deterministic
  * partition sizing).
  */
object Skew {

  /** Salted equi-join: the large side's rows get a deterministic salt in
    * [0, saltFactor) derived from the full row content PLUS the input
    * partition id, and the small side is replicated once per salt value.
    * The join key becomes (key, salt), splitting each hot key's rows
    * across `saltFactor` partitions. Semantically identical to
    * `large.join(small, key)` for inner joins.
    *
    * Why this salt: content-derived alone is retry-exact but maps
    * IDENTICAL rows to one salt — a hot key made of duplicated payloads
    * would not split at all. Mixing in `spark_partition_id()` (stable
    * under task retry, unlike `rand()`, which can lose/duplicate rows on
    * stage retries once it feeds a shuffle) spreads duplicates that span
    * input partitions. Duplicates WITHIN one input partition still share
    * a salt; a key that is hot purely from intra-partition duplicates is
    * better served by pre-aggregation than salting. */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*) +: Seq(spark_partition_id()): _*),
        lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-distribution diagnostic for a prospective shuffle/join key — the
    * number you look at BEFORE deciding between plain hash join, AQE skew
    * split, and [[saltedJoin]]. One row: total rows, distinct keys, the
    * heaviest key's row count and share, exact p50/p99 of per-key counts,
    * and a suggested salt factor = ⌈max_cnt / mean_cnt⌉ (how many
    * partitions the hottest key must split across to look average).
    *
    * Determinism: counts are integers; top1_share is one int/int IEEE
    * division; the suggested salt is pure integer arithmetic
    * (⌈a/b⌉ = (a+b-1) div b); percentiles follow q_percentile's
    * exact-interpolation convention. Scale: one map-combined count per
    * key [the only shuffle], then a single-row reduce; the per-key count
    * frame is never wider than (key, long). */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        round(expr("percentile(cnt, 0.5)"), 6).as("p50_cnt"),
        round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        (col("max_cnt").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        col("p50_cnt"), col("p99_cnt"),
        expr("(max_cnt * n_keys + n_rows - 1) div n_rows").as("suggested_salt"))
  }
}
