package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("s"),
      min(col("v")).as("lo"),
      max(col("v")).as("hi"))

  test("merged states equal a full recompute, including delta-only keys") {
    val all = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 9L), ("c", 7L))
      .toDF("k", "v")
    // history misses key c entirely; delta misses key a
    val hist = state(all.where(col("v") < 6))
    val delta = state(all.where(col("v") >= 6))
    val merged = Incremental.mergeStates(Seq(hist, delta), Seq("k"),
        Seq("n" -> "sum", "s" -> "sum", "lo" -> "min", "hi" -> "max"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val full = state(all)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("three-way merge folds like two-way (associativity in practice)") {
    val all = (1 to 90).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "v")
    val parts = Seq(
      state(all.where(col("v") % 3 === 0)),
      state(all.where(col("v") % 3 === 1)),
      state(all.where(col("v") % 3 === 2)))
    val merged = Incremental.mergeStates(parts, Seq("k"),
        Seq("n" -> "sum", "s" -> "sum", "lo" -> "min", "hi" -> "max"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == state(all).as[(String, Long, Long, Long, Long)].collect().toSet)
  }

  test("non-algebraic merge ops are rejected loudly") {
    val st = state(Seq(("a", 1L)).toDF("k", "v"))
    val ex = intercept[IllegalArgumentException] {
      Incremental.mergeStates(Seq(st), Seq("k"), Seq("n" -> "median"))
    }
    assert(ex.getMessage.contains("non-algebraic"))
  }
}
