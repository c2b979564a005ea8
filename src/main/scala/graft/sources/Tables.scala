package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the test-data star schema. The only normalization needed is
  * `events.ts`: the file stores TIMESTAMP(NANOS), which Spark's vectorized
  * parquet reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
  * (set by every entry point here) the column arrives as nanos-since-epoch
  * LongType; `div 1000` (integral — a double roundtrip would lose precision
  * at 1e18 magnitudes) converts losslessly to microseconds, the values'
  * true resolution. */
object Tables {

  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Persist a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join with ZERO exchanges — the co-location
    * replaces the shuffle, the sort order replaces the sort. This is the
    * staging layout for repeated big-big joins at scale (e.g. edge tables
    * repeatedly resolved against the same node key). Requires a session
    * catalog (`spark.sql.warehouse.dir`); bucketBy only writes managed
    * tables. */
  def writeBucketed(
      df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)

  /** `ts` normalization shared by the batch and streaming event readers:
    * TIMESTAMP(NANOS) surfaces as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true` and becomes a micros
    * timestamp; an already-readable timestamp passes through. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
}
