package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Sampling, TextAnalysis}
import graft.functions.{HashFunctions => H}

/** Throwaway stage profiler for benchmarkOverlap (q_contamination). */
object ProfileContamination {
  private def time[A](label: String)(body: => A): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.where(Sampling.hashGate(col("doc_id"), 0.05, "bench"))
    val corpus = docs.where(!Sampling.hashGate(col("doc_id"), 0.05, "bench"))
    def run(): Unit = {
      time("corpus-grams-project") {
        corpus.select(col("doc_id"), H.wordShingles(col("text"), 3).as("g"))
          .queryExecution.toRdd.count()
      }
      time("corpus-grams-explode") {
        corpus.select(col("doc_id"), explode(H.wordShingles(col("text"), 3)).as("gram"))
          .queryExecution.toRdd.count()
      }
      time("bench-grams-distinct") {
        bench.select(explode(H.wordShingles(col("text"), 3)).as("gram")).distinct()
          .queryExecution.toRdd.count()
      }
      time("full-benchmarkOverlap") {
        TextAnalysis.benchmarkOverlap(corpus, bench, "doc_id", "text", 3, 0.2)
          .queryExecution.toRdd.count()
      }
    }
    println("=== pass 1 (cold) ==="); run()
    println("=== pass 2 (warm) ==="); run()
    spark.stop()
  }
}
