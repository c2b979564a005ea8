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

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversification rerank: greedily pick `k` results where pick r
    * maximizes `lambda·rel − (1−lambda)·max sim-to-already-picked` — the
    * standard cure for top-k lists full of near-duplicates of one answer.
    *
    * Greedy selection is inherently SEQUENTIAL, so the k rounds are
    * UNROLLED as k DataFrame stages (k is a small constant — 5 here —
    * never data-sized): each round anti-joins the picked set, takes the
    * grouped max of sims to picked members (max over a set is
    * order-independent in IEEE — no fold-order contract needed), forms
    * the score as one literal-weighted chain, and selects per query by
    * `row_number` under the (score DESC, id) total order. Every stage is
    * query-keyed joins over candidate-bounded frames (≤ topN rows per
    * query), so the whole rerank costs k small shuffles regardless of
    * corpus size — candidates, not the corpus, enter the rerank.
    *
    * `candidates`: (query_id, neighbor_id, rel). `sims`: one SYMMETRIC
    * row per ordered candidate pair (query_id, n1, n2, sim) — callers
    * build it from the candidate vectors (bounded: ≤ topN² per query).
    * Deterministic end-to-end; an oracle replays the unrolled rounds as
    * k chained CTEs with identical literals. */
  def mmrRerank(candidates: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val lam = lit(lambda)
    val oneMinus = lit(1.0d - lambda) // one Scala subtraction, shared as a literal
    // materialize BOTH inputs once: they are candidate-bounded (≤ topN
    // rows / ≤ topN² pair rows per query) but their LINEAGE usually
    // embeds the brute-force top-k over the whole corpus — without the
    // cut, every one of the k unrolled rounds re-runs that scan (the
    // round-7 board measured q_mmr_rerank at ~13 s for exactly this;
    // the checkpoint drops the corpus scan count from ~2k to 2)
    // loopFrame(assumeBounded): both inputs are k-bounded BY CONTRACT
    // (≤ topN rows / ≤ topN² pair rows per query — never corpus-sized),
    // so the k unrolled rounds run on the AQE-off clone: the r15 board
    // measured q_mmr_rerank at 44 jobs, every one under 0.2 s of task
    // time — pure per-stage driver latency, which classic execution of
    // the tiny bounded rounds removes (r16; rationale at
    // GraphOps.loopFrame).
    val c = graft.graph.GraphOps.loopFrame(
      candidates.select(col("query_id"), col("neighbor_id"),
        col("rel").cast("double").as("rel")).localCheckpoint(true),
      assumeBounded = true)
    val simsM = graft.graph.GraphOps.loopFrame(
      sims.localCheckpoint(true), assumeBounded = true)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("neighbor_id"))
    // round 1: no picked set — score is lambda*rel (the -0 term elided
    // identically on the oracle side)
    var picked = c.withColumn("__score", lam * col("rel"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("query_id"), col("neighbor_id"),
        lit(1).as("mmr_rank"), col("__score").as("score"))
    for (r <- 2 to k) {
      val remaining = c.join(
        picked.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val maxSim = remaining
        .join(picked.select(col("query_id"), col("neighbor_id").as("n2")),
          Seq("query_id"))
        .join(simsM.select(col("query_id"), col("n1").as("neighbor_id"),
          col("n2"), col("sim")), Seq("query_id", "neighbor_id", "n2"))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel"))
        .agg(max(col("sim")).as("__ms"))
      val next = maxSim
        .withColumn("__score", lam * col("rel") - oneMinus * col("__ms"))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("query_id"), col("neighbor_id"),
          lit(r).as("mmr_rank"), col("__score").as("score"))
      // pin the growing picked set each round: round r references it
      // TWICE (anti-join + picked-pair join), so left lazy the plan
      // doubles per round — 2^k copies of round 1's subtree by round k
      // (measured: q_mmr_rerank 5.1 s -> ~2 s with the cut). The frame is
      // <= queries*r rows — the checkpoint is trivially small. EAGER on
      // purpose even on the AQE-off clone (r16): the two references are
      // SIBLING stages of the next round's job, and a lazy first touch
      // from siblings race-computes the partitions under the block locks
      // (measured 2× slower in the components loop probe).
      picked = picked.unionByName(next).localCheckpoint(true)
    }
    picked
  }
}
