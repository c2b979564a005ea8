package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{CorpusPipeline, Dedup}
import graft.operators.Normalize
import graft.functions.{TextFunctions => T}

/** Scratch profiler for the corpus-cleaning funnel (not part of the
  * product surface). */
object ProfileFunnel {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    docs.count()

    // cold-run stage decomposition (mirrors funnel's execution)
    val sanitized0 = Normalize.sanitizeStrings(docs)
    val quality0 = sanitized0.where(T.qualityScore(col("text")) >= 0.2)
    val exactCold = Dedup.exactDedup(quality0, "doc_id", Seq("text")).cache()
    time("cold-counts-agg") {
      sanitized0.agg(count(lit(1)), count(when(T.qualityScore(col("text")) >= 0.2, 1))).head()
    }
    time("cold-cache+count")(exactCold.count())
    val pairsCold = Dedup.minhashNearDuplicates(exactCold, "doc_id", "text", 5, 128, 16, 0.8)
    time("cold-pairs")(pairsCold.count())
    time("cold-clusters")(Dedup.resolveDuplicateClusters(pairsCold).count())
    time("cold-drop+count")(Dedup.dropNearDuplicates(exactCold, "doc_id", pairsCold).count())
    exactCold.unpersist()

    time("funnel-2nd")(CorpusPipeline.funnel(docs, "doc_id", "text").count())

    time("funnel")(CorpusPipeline.funnel(docs, "doc_id", "text").count())

    // stage timings
    val sanitized = Normalize.sanitizeStrings(docs)
    val quality = sanitized.where(T.qualityScore(col("text")) >= 0.2)
    time("quality.count")(quality.count())
    val exact = Dedup.exactDedup(quality, "doc_id", Seq("text"))
    time("exact.count")(exact.count())
    val pairs = time("pairs-build+count") {
      val p = Dedup.minhashNearDuplicates(exact, "doc_id", "text", 5, 128, 16, 0.8)
      p.count(); p
    }
    time("clusters")(Dedup.resolveDuplicateClusters(pairs).count())
    time("drop")(Dedup.dropNearDuplicates(exact, "doc_id", pairs).count())

    val exactC = exact.cache()
    time("exact.cache-materialize")(exactC.count())
    time("pairs-on-cached") {
      Dedup.minhashNearDuplicates(exactC, "doc_id", "text", 5, 128, 16, 0.8).count()
    }
    time("drop-on-cached") {
      Dedup.dropNearDuplicates(exactC, "doc_id",
        Dedup.minhashNearDuplicates(exactC, "doc_id", "text", 5, 128, 16, 0.8)).count()
    }
    exactC.unpersist()
    spark.stop()
  }
}
