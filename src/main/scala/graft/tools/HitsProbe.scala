package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the product surface): print the EXECUTED
  * plan of one real hitsFixedPoint round over the staged bipartite
  * table — the real rounds materialize inside localCheckpoint jobs and
  * are invisible to a plan dump of the query result, so this replays
  * round 1 inline to audit its exchange/reuse structure. */
object HitsProbe {
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

    val sym = graft.SparkEntry.stagedBipartiteEdges(spark, dir)
    // mirror hitsFixedPoint(q_hits args): e = even half, eDst = odd half swapped
    val e0 = sym.where(col("src") % 2 === 0)
      .select(col("src").as("src"), col("dst").as("dst"))
    val d0 = sym.where(col("src") % 2 === 1)
      .select(col("dst").as("src"), col("src").as("dst"))
      .select(col("src").as("src"), col("dst").as("dst"))
    val e = graft.graph.GraphOps.pinForProbe(e0)
    val eDst = graft.graph.GraphOps.pinForProbe(d0)
    val hub = e.select(col("src").as("node")).distinct()
      .withColumn("hub_fp", lit(1000000L))

    // r15 shape: raw frames pinned per half-round; node frames broadcast;
    // each layout serves its FOLD key (eDst -> dst fold, e -> src fold)
    val authRaw = eDst.join(broadcast(hub), col("src") === col("node"))
      .groupBy(col("dst")).agg(sum(col("hub_fp")).as("raw"))
    authRaw.queryExecution.toRdd.count() // execute so the AQE plan is final
    val authRawP = authRaw.localCheckpoint(true)
    println("===== ROUND-1 AUTH-RAW PLAN (executed inside its pin) =====")
    println(authRaw.queryExecution.executedPlan.toString())
    val auth = authRawP.crossJoin(broadcast(authRawP.agg(max(col("raw")).as("m"))))
      .select(col("dst").as("node"), expr("(raw * 1000000) div m").as("auth_fp"))
    val hubRaw = e.join(broadcast(auth), col("dst") === col("node"))
      .groupBy(col("src")).agg(sum(col("auth_fp")).as("raw"))
    hubRaw.queryExecution.toRdd.count()
    val hubRawP = hubRaw.localCheckpoint(true)
    println("===== ROUND-1 HUB-RAW PLAN (executed inside its pin) =====")
    println(hubRaw.queryExecution.executedPlan.toString())
    val hub1 = hubRawP.crossJoin(broadcast(hubRawP.agg(max(col("raw")).as("m"))))
      .select(col("src").as("node"), expr("(raw * 1000000) div m").as("hub_fp"))
    hub1.queryExecution.toRdd.count()
    println("===== ROUND-1 HUB (scaled) PLAN (executed) =====")
    println(hub1.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
