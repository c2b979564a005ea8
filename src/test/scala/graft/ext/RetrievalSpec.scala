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

  test("MMR rerank trades a near-copy for a diverse hit; pure relevance would not") {
    // candidates: A1 (rel .95), A2 (rel .94, near-copy of A1), B (rel .80,
    // unrelated). Relevance-greedy top-2 = {A1, A2}; MMR at lambda .7 must
    // pick B second: .7*.94 − .3*.98 = .364 < .7*.80 − .3*.10 = .53
    val cand = Seq((1L, 10L, 0.95), (1L, 11L, 0.94), (1L, 20L, 0.80))
      .toDF("query_id", "neighbor_id", "rel")
    val half = Seq((1L, 10L, 11L, 0.98), (1L, 10L, 20L, 0.10), (1L, 11L, 20L, 0.10))
      .toDF("query_id", "n1", "n2", "sim")
    val sims = half.unionByName(half.select(col("query_id"),
      col("n2").as("n1"), col("n1").as("n2"), col("sim")))
    val picks = Retrieval.mmrRerank(cand, sims, k = 3, lambda = 0.7)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getInt(2), r.getLong(1)))
    assert(picks.toSeq == Seq((1, 10L), (2, 20L), (3, 11L)),
      s"expected diverse pick order, got ${picks.toSeq}")
    // a query with fewer candidates than k yields exactly its candidates
    val tiny = Retrieval.mmrRerank(
      Seq((2L, 5L, 0.5)).toDF("query_id", "neighbor_id", "rel"),
      sims.where(lit(false)), k = 3, lambda = 0.7).collect()
    assert(tiny.length == 1 && tiny.head.getInt(2) == 1)
  }
}
