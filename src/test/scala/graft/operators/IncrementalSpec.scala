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

  test("quantileFromCounts replays percentile() exactly, odd/even/interpolated") {
    // key a: n=4 (even, interpolated midpoint); key b: n=5 (odd, exact
    // middle); key c: n=1; key d: heavy duplicates (counts > 1 per value)
    val all = Seq(
      ("a", 1L), ("a", 3L), ("a", 7L), ("a", 10L),
      ("b", 5L), ("b", 1L), ("b", 9L), ("b", 3L), ("b", 7L),
      ("c", 42L),
      ("d", 2L), ("d", 2L), ("d", 2L), ("d", 8L), ("d", 8L), ("d", 9L))
      .toDF("k", "v")
    for (q <- Seq(0.5, 0.25, 0.9, 0.0, 1.0)) {
      val st = Incremental.valueCountState(all, Seq("k"), "v")
      val got = Incremental.quantileFromCounts(st, Seq("k"), "v", q)
        .as[(String, Double)].collect().toMap
      val want = all.groupBy("k")
        .agg(expr(s"percentile(v, $q)").as("p"))
        .as[(String, Double)].collect().toMap
      assert(got == want, s"q=$q")
    }
  }

  test("co-occurrence pair states merge exactly; threshold AFTER merge, not inside") {
    // orders 1 (history) and 10 (delta) both hold {7, 8}: the pair's
    // support is 1 in each state and only clears minShared = 2 combined —
    // thresholding inside the states would silently lose it
    val li = Seq((1L, 7L), (1L, 8L), (1L, 9L), (10L, 7L), (10L, 8L), (2L, 5L), (2L, 6L))
      .toDF("o", "p")
    def state(df: org.apache.spark.sql.DataFrame) =
      graft.graph.GraphOps.coOccurrencePairs(df, "o", "p", minShared = 1)
    val merged = Incremental.mergeStates(
        Seq(state(li.where(col("o") < 10)), state(li.where(col("o") === 10))),
        Seq("pa", "pb"), Seq("w" -> "sum"))
      .where(col("w") >= 2)
      .as[(Long, Long, Long)].collect().toSet
    val full = graft.graph.GraphOps.coOccurrencePairs(li, "o", "p", minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == full && merged == Set((7L, 8L, 2L)),
      s"merged=$merged full=$full")
    // the anti-pattern drops the boundary-straddling pair
    val thresholdedInside = Incremental.mergeStates(
        Seq(graft.graph.GraphOps.coOccurrencePairs(li.where(col("o") < 10), "o", "p", minShared = 2),
          graft.graph.GraphOps.coOccurrencePairs(li.where(col("o") === 10), "o", "p", minShared = 2)),
        Seq("pa", "pb"), Seq("w" -> "sum"))
      .as[(Long, Long, Long)].collect().toSet
    assert(thresholdedInside.isEmpty, "pre-merge thresholding must lose the pair (the documented hazard)")
  }

  test("median from MERGED value-count states equals full recompute") {
    val all = (1 to 100).map(i => (s"k${i % 3}", (i * 7 % 13).toLong)).toDF("k", "v")
    val hist = Incremental.valueCountState(all.where(col("v") < 6), Seq("k"), "v")
    val delta = Incremental.valueCountState(all.where(col("v") >= 6), Seq("k"), "v")
    val merged = Incremental.mergeStates(Seq(hist, delta), Seq("k", "v"),
      Seq("cnt" -> "sum"))
    val got = Incremental.quantileFromCounts(merged, Seq("k"), "v", 0.5)
      .as[(String, Double)].collect().toMap
    val want = all.groupBy("k").agg(expr("percentile(v, 0.5)").as("p"))
      .as[(String, Double)].collect().toMap
    assert(got == want)
  }
}
