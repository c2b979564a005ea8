package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r16): the testdata base tables are SINGLE-ROW-GROUP
  * parquet files, so a scan stage cannot parallelize via splits — any
  * compute-heavy per-row projection (md5, BPE, regex) runs effectively
  * single-task no matter how many (empty) splits the planner makes.
  * Measure the kernel cost as-scanned vs round-robin repartitioned to
  * the core count, to size the win before touching any query shape.
  * Usage: ScanProbe <sfDir> [reps=4] */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    graft.SparkEntry.initStaging()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "128k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    // fk_sketch-like kernel: md5 over the widest fact column set
    time("md5-asis") {
      li.select(md5(col("l_partkey").cast("string")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)))
    }
    time("md5-repart") {
      li.repartition(cpus.toInt)
        .select(md5(col("l_partkey").cast("string")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)))
    }
    // pure scan (how much of "as-is" is the scan itself)
    time("scan-only") { li.select(col("l_partkey")) }
    // bpe-like kernel over documents
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    val sample = docs.where(col("doc_id") < 50 && col("text").isNotNull &&
      length(col("text")) > 0).select(col("text")).collect().map(_.getString(0)).toSeq
    val merges = graft.functions.Bpe.train(sample, numMerges = 24)
    time("bpe-asis") {
      docs.select(col("doc_id"),
        graft.functions.Bpe.tokenCount(col("text"), merges).as("n"))
    }
    time("bpe-repart") {
      docs.repartition(cpus.toInt).select(col("doc_id"),
        graft.functions.Bpe.tokenCount(col("text"), merges).as("n"))
    }
    spark.stop()
  }
}
