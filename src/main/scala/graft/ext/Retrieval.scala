package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval primitives: rank-list fusion over independently-ranked
  * candidate lists (lexical BM25 + embedding cosine being the canonical
  * pair in a RAG ingestion/eval pipeline).
  *
  * Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): each list
  * contributes `1 / (k + rank)`; documents missing from a list contribute
  * 0. RRF needs no score calibration between the lists — only ranks cross
  * the fusion boundary, which is also what makes it reproducible across
  * engines: ranks are integers, each reciprocal is ONE IEEE division, and
  * the two-list sum is a single addition (order-irrelevant), so another
  * engine replaying the same ranked lists gets bit-identical fusion
  * scores.
  *
  * Scale: the inputs are top-k lists (bounded — k rows per query, never
  * corpus-sized), so the fusion join is a few-MB broadcast regardless of
  * corpus size; the heavy lifting stays in the upstream rankers, which
  * each keep their own scale story (BM25 = one term-filtered aggregation,
  * ANN = IVF-bucketed search).
  */
object Retrieval {

  /** Fuse two ranked lists by RRF. Inputs carry (idCol, rankCol) with rank
    * starting at 1; output is (idCol, rank_a, rank_b, rrf) sorted by
    * (rrf desc, id asc) and truncated to `topK`. Ranks absent from one
    * list surface as NULL with contribution 0. */
  def rrfFuse2(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
      k: Int = 60, topK: Int = 10): DataFrame = {
    val la = a.select(col(idCol).as("__id"), col(rankCol).cast("long").as("rank_a"))
    val lb = b.select(col(idCol).as("__id"), col(rankCol).cast("long").as("rank_b"))
    def contrib(r: Column): Column =
      coalesce(lit(1.0d) / (lit(k.toDouble) + r.cast("double")), lit(0.0d))
    la.join(lb, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("rank_a"), col("rank_b"),
        (contrib(col("rank_a")) + contrib(col("rank_b"))).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }
}
