package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scratch probe: per-leg cost decomposition of the q_cdc_delta chunking
  * (not part of the product surface). */
object CdcProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"CDCPROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.initStaging()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    def chunkCount(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.contentDefinedChunks(df, "doc_id", "text", window = 16, mask = 64)
        .select(md5(col("chunk")).as("h"), length(col("chunk")).as("len"))
        .queryExecution.toRdd.count()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("full-base")(chunkCount(base))
      time("upper-leg")(chunkCount(
        base.where(col("doc_id") % 11 =!= 3 && col("doc_id") % 7 === 0)
          .select(col("doc_id"), upper(col("text")).as("text"))))
      time("new-leg")(chunkCount(
        base.where(col("doc_id") % 13 === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new:"), col("text")).as("text"))))
      time("full-upper")(chunkCount(
        base.select(col("doc_id"), upper(col("text")).as("text"))))
    }

    // end-to-end old vs new q_cdc_delta body (the result aggregates)
    def finish(s1: org.apache.spark.sql.DataFrame,
        s2: org.apache.spark.sql.DataFrame): Unit = {
      val fresh = s2.join(s1.select(col("h")), Seq("h"), "left_anti")
      s2.agg(count(lit(1)).as("v2_chunks"), sum(col("len")).as("v2_chars"))
        .crossJoin(fresh.agg(
          coalesce(count(lit(1)), lit(0L)).as("new_chunks"),
          coalesce(sum(col("len")), lit(0L)).as("new_chars")))
        .withColumn("transfer_ratio",
          col("new_chars").cast("double") / col("v2_chars").cast("double"))
        .queryExecution.toRdd.count(): Unit
    }
    def oldDelta(): Unit = {
      val upserts = base.withColumn("op",
        when(col("doc_id") % 11 === 3, "D").when(col("doc_id") % 7 === 0, "U"))
      val v2 = upserts.where(col("op").isNull || col("op") === "U")
        .select(col("doc_id"),
          when(col("op") === "U", upper(col("text"))).otherwise(col("text")).as("text"))
        .unionByName(base.where(col("doc_id") % 13 === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new:"), col("text")).as("text")))
      def store(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        Dedup.contentDefinedChunks(df, "doc_id", "text", window = 16, mask = 64)
          .groupBy(md5(col("chunk")).as("h"))
          .agg(min(length(col("chunk"))).as("len"))
          .localCheckpoint(true)
      finish(store(base), store(v2))
    }
    def newDelta(): Unit = {
      val hashedBase = Dedup.contentDefinedChunks(
          base, "doc_id", "text", window = 16, mask = 64)
        .select(col("doc_id"), md5(col("chunk")).as("h"),
          length(col("chunk")).as("len"))
        .localCheckpoint(true)
      def group(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.groupBy(col("h")).agg(min(col("len")).as("len")).localCheckpoint(true)
      val s1 = group(hashedBase.select(col("h"), col("len")))
      val changedV2 = base
        .where(col("doc_id") % 11 =!= 3 && col("doc_id") % 7 === 0)
        .select(col("doc_id"), upper(col("text")).as("text"))
        .unionByName(base.where(col("doc_id") % 13 === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new:"), col("text")).as("text")))
      val s2 = group(
        hashedBase
          .where(col("doc_id") % 11 =!= 3 && col("doc_id") % 7 =!= 0)
          .select(col("h"), col("len"))
        .unionByName(Dedup.contentDefinedChunks(
            changedV2, "doc_id", "text", window = 16, mask = 64)
          .select(md5(col("chunk")).as("h"),
            length(col("chunk")).as("len"))))
      finish(s1, s2)
    }
    for (rep <- 1 to 4) {
      println(s"--- e2e rep $rep")
      time("old-delta")(oldDelta())
      time("new-delta")(newDelta())
    }
    spark.stop()
  }
}
