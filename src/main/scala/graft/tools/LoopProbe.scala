package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16): dump the executed plan of ONE star-contraction
  * round in the NEW loop form (AQE-off clone + lazy checkpoints + fused
  * fingerprint) — the isolated-timing regression said something in the
  * round plan degenerated; this shows what. */
object LoopProbe {
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
    val e = graft.graph.GraphOps.loopFrame(
      edges.where(col("a") > col("b"))
        .select(col("a").as("u"), col("b").as("v")))
      .localCheckpoint(false)
    println("e session AQE = " + e.sparkSession.conf.get("spark.sql.adaptive.enabled"))
    def mins(edgeSet: DataFrame): DataFrame =
      edgeSet.select(col("u").as("x"), col("v").as("y"))
        .union(edgeSet.select(col("v").as("x"), col("u").as("y")))
        .groupBy(col("x")).agg(min(col("y")).as("nbMin"))
        .select(col("x"), least(col("nbMin"), col("x")).as("m"))
    val sym1 = e.select(col("u").as("x"), col("v").as("y"))
      .union(e.select(col("v").as("x"), col("u").as("y")))
    val ls = sym1.join(mins(e), Seq("x"))
      .where(col("y") > col("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .distinct()
      .localCheckpoint(false)
    val sym2 = ls.select(col("u").as("x"), col("v").as("y"))
      .union(ls.select(col("v").as("x"), col("u").as("y")))
    val m2 = mins(ls)
    val ss = sym2.where(col("y") < col("x")).join(m2, Seq("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .union(m2.select(col("x").as("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    val fp = ss.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        println(f"  stage ${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"run=${i.taskMetrics.executorRunTime / 1e3}%.2fs " +
          f"cpu=${i.taskMetrics.executorCpuTime / 1e9}%.2fs " +
          f"deser=${i.taskMetrics.executorDeserializeTime / 1e3}%.2fs " +
          f"gc=${i.taskMetrics.jvmGCTime / 1e3}%.2fs  ${i.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fp.queryExecution.toRdd.count()
    Thread.sleep(500)
    println(f"round wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println("===== PRE-CHECKPOINT SS PLAN (what the fused job executes) =====")
    val ss2 = sym2.where(col("y") < col("x")).join(m2, Seq("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .union(m2.select(col("x").as("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
    println(ss2.queryExecution.executedPlan.toString())
  }
}
