package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16): hitsFixedPoint keeps per-direction edge pins on
  * the strength of an r11 measurement (pin 3.4-4.7 s vs re-scan
  * 4.6-5.1 s) taken before the AQE-off loop clone, the codegen cache and
  * the schema cache existed. Re-measure interleaved in one JVM: pinned
  * edge views vs direct bucketed-scan views, identical integer output
  * asserted. */
object HitsPinProbe {
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

    val sym = graft.SparkEntry.stagedBipartiteEdges(spark, dir)
    def fwd = sym.where(col("src") % 2 === 0).select(col("src"), col("dst"))
    def rev = sym.where(col("src") % 2 === 1)
      .select(col("dst").as("src"), col("src").as("dst"))

    def loop(e: DataFrame, eDst: DataFrame): DataFrame = {
      var hub = e.select(col("src").as("node")).distinct()
        .withColumn("hub_fp", lit(1000000L))
      var auth: DataFrame = hub.limit(0).withColumnRenamed("hub_fp", "auth_fp")
      for (_ <- 1 to 3) {
        val authRaw = eDst.join(broadcast(hub), col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("hub_fp")).as("raw"))
          .localCheckpoint(true)
        auth = authRaw.crossJoin(broadcast(authRaw.agg(max(col("raw")).as("m"))))
          .select(col("dst").as("node"), expr("(raw * 1000000) div m").as("auth_fp"))
        val hubRaw = e.join(broadcast(auth), col("dst") === col("node"))
          .groupBy(col("src")).agg(sum(col("auth_fp")).as("raw"))
          .localCheckpoint(true)
        hub = hubRaw.crossJoin(broadcast(hubRaw.agg(max(col("raw")).as("m"))))
          .select(col("src").as("node"), expr("(raw * 1000000) div m").as("hub_fp"))
      }
      hub.select(col("node"), lit("hub").as("kind"), col("hub_fp").as("score_fp"))
        .unionByName(auth.select(col("node"), lit("auth").as("kind"),
          col("auth_fp").as("score_fp")))
    }
    import graft.graph.GraphOps.{loopFrameForProbe => lf, pinForProbe => pin}
    def pinnedRun: DataFrame = loop(lf(pin(fwd)), lf(pin(rev)))
    def scanRun: DataFrame = loop(lf(fwd), lf(rev))

    val a = pinnedRun.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(x => (x._2, x._1))
    val b = scanRun.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(x => (x._2, x._1))
    println(s"IDENTICAL: ${a.sameElements(b)} (${a.length} rows)")

    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    time("pinned")(pinnedRun)
    time("scan")(scanRun)
    time("pinned2")(pinnedRun)
    time("scan2")(scanRun)
    spark.stop()
  }
}
