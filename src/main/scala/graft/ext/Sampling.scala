package graft.ext

import org.apache.spark.sql.{DataFrame, Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, LongType}

/** Deterministic, engine-portable sampling and ordering for training-data
  * pipelines. Everything keys off `md5(key)` hex prefixes — uniform,
  * seedable (prefix the key), reproducible across engines (md5 hex is
  * identical in Spark, DuckDB, Python, …), and embarrassingly parallel:
  * a sample decision is a per-row projection, never a shuffle.
  *
  * Contrast with `df.sample()`: Spark's sampler is seeded per-partition, so
  * the kept set changes whenever partitioning changes — useless for
  * reproducible corpus construction at 100 TB where partition counts move
  * with the data. Hash-gating is stable under any layout.
  */
object Sampling {

  private val Hex8 = 0x100000000L // 16^8 — space of an 8-hex-char prefix

  /** `fraction` as an 8-hex-char upper bound, e.g. 0.25 -> "40000000".
    * Fraction 1.0 returns "g" — lexicographically above every hex string,
    * so keep-all really keeps ALL rows (a "ffffffff" bound with a strict
    * `<` would silently drop the 2^-32 of rows whose prefix is exactly
    * "ffffffff" — hundreds of rows at trillion-row scale). */
  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) "g" else f"${(fraction * Hex8).toLong}%08x"
  }

  /** The md5-prefix gate value for a key (shared by every sampler so the
    * family stays mutually consistent). NULL keys hash a sentinel instead
    * of null-propagating: otherwise keep-all sampling would silently drop
    * null-key rows while splitAssign's otherwise-branch routed the same
    * rows into the LAST split — inconsistent family semantics. The DuckDB
    * oracles apply the same coalesce. */
  private def saltedKey(key: Column, seed: String): Column =
    concat(lit(seed), coalesce(key.cast("string"), lit("\u0000null")))

  private def gateValue(key: Column, seed: String): Column =
    substring(md5(saltedKey(key, seed)), 1, 8)

  /** The gate column: first 8 hex chars of md5(seed:key), lexicographically
    * below the fraction's threshold. Lowercase-hex compare == numeric
    * compare, and both Spark and DuckDB emit lowercase md5 hex. */
  def hashGate(key: Column, fraction: Double, seed: String = ""): Column =
    gateValue(key, seed) < lit(hexThreshold(fraction))

  /** Keep a deterministic `fraction` of rows, decided per-row by key hash.
    * Narrow (no shuffle, no state); the same rows survive at any
    * partitioning, scale factor, or engine. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: String = ""): DataFrame =
    df.where(hashGate(col(keyCol), fraction, seed))

  /** Weighted corpus mixture: per-stratum keep-fractions (e.g. upsample
    * wiki, downsample crawl), default fraction for unlisted strata. One
    * narrow pass — the per-row gate threshold is a CASE over the stratum
    * column, so mixing N corpora costs the same as reading them. */
  def mixtureSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      weights: Map[String, Double], defaultFraction: Double = 1.0,
      seed: String = ""): DataFrame = {
    val threshold = weights.toSeq.sortBy(_._1).foldRight(
      lit(hexThreshold(defaultFraction)): Column) { case ((stratum, f), acc) =>
      when(col(stratumCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    df.where(gateValue(col(keyCol), seed) < threshold)
  }

  /** Deterministic train/val/test split: each row is assigned the first
    * split whose cumulative hash-range contains its key hash. Stable under
    * any partitioning/scale (a doc keeps its split when the corpus grows),
    * narrow, engine-portable. `splits` are (name, weight) in priority
    * order; weights must sum to 1 (±1e-9) and the last split absorbs the
    * hash-range remainder so every row is assigned. */
  def splitAssign(
      df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      seed: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val gate = gateValue(col(keyCol), seed)
    val cum = splits.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val assigned = splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cumW), acc) =>
        when(gate < lit(hexThreshold(cumW)), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** The hex gate boundary for a cumulative weight — exposed so external
    * systems (SQL oracles, Python readers) can reproduce the assignment. */
  def splitBoundary(cumulativeWeight: Double): String = hexThreshold(cumulativeWeight)

  /** Per-stratum quota: keep at most `maxPerStratum` rows per stratum,
    * chosen by hash order (md5 gate value, key as tie-break) so the kept
    * set is a stable pseudo-random draw — the "cap any one domain's share
    * of the corpus" operation. Unlike a fraction-based gate the quota is
    * exact, so it needs a per-stratum rank: one shuffle on the stratum
    * key, with the rank-filter form letting InferWindowGroupLimit bound
    * each stratum's sort to the quota after the exchange. */
  def quotaSample(df: DataFrame, keyCol: String, stratumCol: String,
      maxPerStratum: Int, seed: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerStratum > 0, s"maxPerStratum must be positive, got $maxPerStratum")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(gateValue(col(keyCol), seed), col(keyCol))
    df.withColumn("__qrank", row_number().over(w))
      .where(col("__qrank") <= maxPerStratum)
      .drop("__qrank")
  }

  /** Deterministic global shuffle for training order: every row gets a
    * stable pseudo-random position 0..n-1 (order by md5(seed:key), key as
    * tie-break for md5-prefix collisions).
    *
    * Scale shape: `orderBy` is a range-partitioned distributed sort (no
    * single-partition window), and positions come from `zipWithIndex` on
    * the sorted partitions. zipWithIndex's eager size job would otherwise
    * run the FULL sort once and the consumer's action a second time, so
    * the sorted rows are persisted across the two passes (MEMORY_AND_DISK,
    * released by Spark's LRU once the result is dropped). */
  def shuffleOrder(df: DataFrame, keyCol: String, seed: String = "",
      posCol: String = "position"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__sk", md5(saltedKey(col(keyCol), seed)))
      .orderBy(col("__sk"), col(keyCol))
      .drop("__sk")
    val schema = sorted.schema.add(StructField(posCol, LongType, nullable = false))
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = sortedRdd.zipWithIndex().map { case (row, idx) => Row.fromSeq(row.toSeq :+ idx) }
    spark.createDataFrame(rdd, schema)
  }
}
