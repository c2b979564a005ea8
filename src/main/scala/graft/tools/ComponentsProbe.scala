package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the product surface): print the executed
  * plan of ONE star-contraction round's small-star job, with and
  * without the large-star output pinned — the evidence for the r15
  * decision to leave `ls` lazy (its four references share the trailing
  * distinct's exchange via ReuseExchange, so the pin only added a
  * per-round job barrier and, at scale, an edge-sized materialization). */
object ComponentsProbe {
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

    val edges = graft.SparkEntry.stagedCoPurchaseSymBuckets(spark, dir, buckets = 16, nameTag = "")
    val e = edges.where(col("a") > col("b"))
      .select(col("a").as("u"), col("b").as("v"))
      .localCheckpoint(true)
    def mins(edgeSet: DataFrame): DataFrame =
      edgeSet.select(col("u").as("x"), col("v").as("y"))
        .union(edgeSet.select(col("v").as("x"), col("u").as("y")))
        .groupBy(col("x")).agg(min(col("y")).as("nbMin"))
        .select(col("x"), least(col("nbMin"), col("x")).as("m"))
    def ssOf(ls: DataFrame): DataFrame = {
      val sym2 = ls.select(col("u").as("x"), col("v").as("y"))
        .union(ls.select(col("v").as("x"), col("u").as("y")))
      val m2 = mins(ls)
      sym2.where(col("y") < col("x")).join(m2, Seq("x"))
        .select(col("y").as("u"), col("m").as("v"))
        .union(m2.select(col("x").as("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    val sym1 = e.select(col("u").as("x"), col("v").as("y"))
      .union(e.select(col("v").as("x"), col("u").as("y")))
    val ls = sym1.join(mins(e), Seq("x"))
      .where(col("y") > col("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .distinct()

    val ssLazy = ssOf(ls)
    ssLazy.queryExecution.toRdd.count()
    println("===== SS PLAN, ls LAZY (r15 form: four references share the distinct exchange) =====")
    println(ssLazy.queryExecution.executedPlan.toString())

    val ssPinned = ssOf(ls.localCheckpoint(true))
    ssPinned.queryExecution.toRdd.count()
    println("===== SS PLAN, ls PINNED (pre-r15 form: extra barrier + edge-sized materialization) =====")
    println(ssPinned.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
