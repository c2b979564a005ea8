package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16, verdict item #3): the q_pagerank/q_ppr profile
  * shows ~10 s of task time in the two layout pins (eD ~100 MB of row
  * copies + block stores) and each round's broadcast build re-reading
  * those 100 MB blocks. A/B: broadcast-iteration pagerank rounds with
  * (a) the pinned swapped view — the shipped form — vs (b) the bucketed
  * staged table scanned directly per round (the swap is a projection, so
  * each round's fold re-reads ~3 MB of parquet instead of 100 MB of
  * blocks, and the pin job disappears). Integer ranks — results must be
  * identical; the probe asserts it. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.initStaging()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def loop(eD: DataFrame, degP: DataFrame, iterations: Int): DataFrame = {
      var ranks = degP.select(col("src").as("node"), lit(1000000L).as("rank_fp"))
      for (_ <- 1 to iterations) {
        val contribBySrc = ranks.join(degP, col("node") === col("src"))
          .select(col("node"), expr("rank_fp div outdeg").as("c"))
        ranks = eD.join(broadcast(contribBySrc), col("src") === col("node"))
          .select(col("dst"), col("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(s * 85) div 100")).as("rank_fp"))
      }
      ranks
    }

    def time(tag: String, reps: Int = 4)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val sym = graft.SparkEntry.stagedBipartiteEdges(spark, dir)
    def pinnedLoop: DataFrame = {
      val eD = graft.graph.GraphOps.loopFrameForProbe(
        graft.graph.GraphOps.pinForProbe(
          sym.select(col("dst").as("src"), col("src").as("dst"))))
      val degP = graft.graph.GraphOps.loopFrameForProbe(
        graft.graph.GraphOps.pinForProbe(
          sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))))
      loop(eD, degP, 5)
    }
    def scanLoop: DataFrame = {
      val eD = graft.graph.GraphOps.loopFrameForProbe(
        sym.select(col("dst").as("src"), col("src").as("dst")))
      val degP = graft.graph.GraphOps.loopFrameForProbe(
        graft.graph.GraphOps.pinForProbe(
          sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))))
      loop(eD, degP, 5)
    }

    // identical integer ranks both ways
    val a = pinnedLoop.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = scanLoop.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    println(s"IDENTICAL: ${a.sameElements(b)} (${a.length} rows)")

    time("pinned-eD")(pinnedLoop)
    time("scan-eD")(scanLoop)
    // interleave to control drift
    time("pinned-eD2")(pinnedLoop)
    time("scan-eD2")(scanLoop)
    spark.stop()
  }
}
