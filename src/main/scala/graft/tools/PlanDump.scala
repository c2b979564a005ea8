package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: print the executed physical plan of named SparkEntry
  * queries (the `.explain`-and-iterate loop PlanSpec pins are written
  * from). Usage: runMain graft.tools.PlanDump <sfDir> <q1,q2,...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',')
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
