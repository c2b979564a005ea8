package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16, verdict item #4): A/B the exact weighted
  * percentile as (a) Spark's percentile(value, ps, cnt) aggregate (3-task
  * per-group buffers) vs (b) a two-level distributed-rank form
  * (GlobalCumSum + broadcast bracket targets + Spark's exact
  * interpolation formula, replicated op-for-op from the 4.1.2 bytecode).
  * Prints bit-equality of the two results and per-form steady-state
  * times; the decision (adopt/record-negative) follows the numbers. */
object PctlProbe {
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
    import spark.implicits._

    def d = graft.SparkEntry.stagedPriceCountsForProbe(spark, dir)
    val ps = Seq(0.05, 0.95)

    // (a) the aggregate form
    def aggForm: DataFrame = d.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D), cnt)").as("pc"))
      .select(col("l_returnflag"), col("pc").getItem(0).as("p0"),
        col("pc").getItem(1).as("p1"))

    // (b) two-level: GlobalCumSum + bracket join + exact interpolation
    def rankForm: DataFrame = {
      val grp = "l_returnflag"
      val withCum = graft.operators.GlobalRank.withGlobalCumSum(
        d, Seq(col(grp), col("l_extendedprice")), col("cnt"), "__cum")
        .withColumn("__c", col("cnt").cast("long"))
      val gstats = withCum.groupBy(col(grp))
        .agg(sum(col("__c")).as("__n"), min(col("__cum")).as("__start"))
      val psDf = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("__i", "__p")
      val targets = gstats.crossJoin(broadcast(psDf))
        .withColumn("__pos", (col("__n") - 1L).cast("double") * col("__p"))
        .withColumn("__lo", floor(col("__pos")))
        .withColumn("__hi", ceil(col("__pos")))
      val b = withCum
        .join(broadcast(targets.select(col(grp), col("__i"), col("__pos"),
            col("__lo"), col("__hi"), col("__start"))),
          Seq(grp))
        .withColumn("__gc", col("__cum") - col("__start"))
        .where((col("__lo") >= col("__gc") && col("__lo") < col("__gc") + col("__c")) ||
               (col("__hi") >= col("__gc") && col("__hi") < col("__gc") + col("__c")))
        .groupBy(col(grp), col("__i"), col("__pos"), col("__lo"), col("__hi"))
        .agg(
          max(when(col("__lo") >= col("__gc") && col("__lo") < col("__gc") + col("__c"),
            col("l_extendedprice"))).as("__lk"),
          max(when(col("__hi") >= col("__gc") && col("__hi") < col("__gc") + col("__c"),
            col("l_extendedprice"))).as("__hk"))
        // Spark PercentileBase.getPercentile, op for op: higher==lower ->
        // lowerKey; higherKey==lowerKey -> lowerKey; else
        // (higher-position)*lowerKey + (position-lower)*higherKey
        .withColumn("__r",
          when(col("__hi") === col("__lo"), col("__lk"))
            .when(col("__hk") === col("__lk"), col("__lk"))
            .otherwise((col("__hi").cast("double") - col("__pos")) * col("__lk") +
              (col("__pos") - col("__lo").cast("double")) * col("__hk")))
      b.groupBy(col(grp))
        .agg(sort_array(collect_list(struct(col("__i"), col("__r")))).as("__a"))
        .select(col(grp), col("__a").getItem(0).getField("__r").as("p0"),
          col("__a").getItem(1).getField("__r").as("p1"))
    }

    // bit-equality: exact double comparison of both forms
    val a = aggForm.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val b = rankForm.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    println(s"agg : ${a.mkString(" ")}")
    println(s"rank: ${b.mkString(" ")}")
    println(s"BIT-EQUAL: ${a.zip(b).forall { case (x, y) =>
      x._1 == y._1 &&
        java.lang.Double.doubleToRawLongBits(x._2) == java.lang.Double.doubleToRawLongBits(y._2) &&
        java.lang.Double.doubleToRawLongBits(x._3) == java.lang.Double.doubleToRawLongBits(y._3) }}")

    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    time("agg-form")(aggForm)
    time("rank-form")(rankForm)
    spark.stop()
  }
}
