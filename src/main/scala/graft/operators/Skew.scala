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
}
