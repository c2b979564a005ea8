package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse2 sums reciprocal ranks and zeroes missing-list entries") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse2(a, b, "id", "rank", k = 60, topK = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toList
    // doc 2 appears in both lists and must lead
    assert(out.head._1 == 2L)
    assert(out.head._4 == 1.0 / 62 + 1.0 / 61)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, Some(1L), None, 1.0 / 61)))
    assert(byId(4L) == ((4L, None, Some(2L), 1.0 / 62)))
    // deterministic tie-break: ids 1 (rank_a=1) and 4 (rank_b=2) differ;
    // but 3 (1/63) sorts below 4 (1/62)
    assert(out.map(_._1) == List(2L, 1L, 4L, 3L))
  }

  test("rrfFuse2 truncates to topK after fusion, not per list") {
    val a = (1L to 8L).map(i => (i, i)).toDF("id", "rank")
    val b = (5L to 12L).map(i => (i, i - 4L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse2(a, b, "id", "rank", k = 60, topK = 3)
    assert(out.count() == 3)
    // doc 5 holds rank 5 in a and rank 1 in b — the highest fused score
    assert(out.collect().head.getLong(0) == 5L)
  }
}
