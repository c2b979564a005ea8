package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline evaluation of a binary scorer over a labeled dataset — the
  * report a data-curation team reads before trusting a quality/dedup/
  * toxicity classifier at 100 TB: exact tie-aware ROC AUC plus the
  * confusion counts and derived rates at an operating threshold.
  *
  * Exactness contract: AUC is the Mann-Whitney U statistic computed
  * ENTIRELY in integers — per distinct score s, positives p(s) pair with
  * the negatives strictly below (concordant) and split ties in half:
  *
  *   num = Σ_s 2·p(s)·negBelow(s) + p(s)·n(s),   AUC = num / (2·n1·n0)
  *
  * one IEEE division at the end, so any engine replays it bit-for-bit —
  * no float rank sums, no summation-order contract.
  *
  * Scale shape: one grouped aggregation to the per-distinct-score frame
  * (map-side combined), then the cumulative-negatives step as a
  * broadcast range join of that SMALL frame against itself — bounded by
  * SCORE-DOMAIN cardinality, not rows (a continuous score gets bucketed
  * first, the standard calibration-curve move; the raw rows are never
  * self-joined). No global window, no single-partition stage. */
object Evaluation {

  def binaryClassifierReport(df: DataFrame, labelCol: Column, scoreCol: Column,
      threshold: Column): DataFrame = {
    // one population for BOTH halves of the report: drop NULL labels up
    // front (the confusion when()-guards already skipped them, but the
    // AUC negative count's otherwise(1) branch would have counted a NULL
    // label as a negative — the two halves would disagree on n_neg)
    val rows = df.select(labelCol.cast("boolean").as("y"),
        scoreCol.as("s"), (scoreCol >= threshold).as("pred"))
      .where(col("y").isNotNull)
    // confusion counts at the operating threshold — one scan
    val conf = rows.agg(
      sum(when(col("y") && col("pred"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("y") && col("pred"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") && !col("pred"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("y") && !col("pred"), 1L).otherwise(0L)).as("tn"))
    // per-distinct-score positives/negatives — the AUC working frame
    val byScore = rows.groupBy(col("s")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("p"),
      sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    val below = byScore.as("a")
      .join(broadcast(byScore.select(col("s").as("s2"), col("n").as("n2"))),
        col("s2") < col("a.s"), "left")
      .select(col("a.s").as("s"), col("a.p").as("p"), col("a.n").as("n"), col("n2"))
      .groupBy(col("s"), col("p"), col("n"))
      .agg(coalesce(sum(col("n2")), lit(0L)).as("neg_below"))
    val auc = below.agg(
      sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
      sum(col("p") * col("neg_below") * 2 + col("p") * col("n")).as("auc_num"))
    conf.crossJoin(broadcast(auc)).select(
      col("n_pos"), col("n_neg"), col("tp"), col("fp"), col("fn"), col("tn"),
      (col("auc_num").cast("double") /
        (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"),
      (col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("precision"),
      (col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).as("recall"),
      ((col("tp") * 2).cast("double") /
        (col("tp") * 2 + col("fp") + col("fn")).cast("double")).as("f1"))
  }

  /** Full THRESHOLD SWEEP — the materialized PR/ROC curve the
    * single-operating-point [[binaryClassifierReport]] cannot show: one
    * row per DISTINCT score value s with the confusion counts of the
    * classifier `score >= s`, plus precision/recall/FPR (each one
    * int/int IEEE division). This is how an operating point is actually
    * CHOSEN; downstream, trapezoid-summing the (fpr, recall) column pairs
    * reproduces the report's AUC.
    *
    * Scale: the frame is bounded by the SCORE DOMAIN, not the rows — one
    * map-combined per-score aggregation, then suffix sums via a window
    * over the distinct-score frame. The window is unpartitioned BUT over
    * domain-bounded rows (same stance as the bootstrap's b-row sort);
    * for an unbounded continuous domain, quantize scores first. */
  def thresholdSweep(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(labelCol.cast("boolean").as("y"), scoreCol.as("s"))
      .where(col("y").isNotNull)
    val byScore = rows.groupBy(col("s")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("p"),
      sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    // suffix sums: tp(s) = positives with score >= s
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byScore.agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"))
    byScore
      .withColumn("tp", sum(col("p")).over(w))
      .withColumn("fp", sum(col("n")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("s").as("threshold"),
        col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n_neg") - col("fp")).as("tn"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("precision"),
        (col("tp").cast("double") / col("n_pos").cast("double")).as("recall"),
        (col("fp").cast("double") / col("n_neg").cast("double")).as("fpr"))
  }

  /** Per-group (sliced) AUC — the fairness/segment report: does the
    * scorer rank equally well inside every language / source / cohort,
    * or is the aggregate AUC hiding a group it fails on? Same integer
    * Mann-Whitney construction as [[binaryClassifierReport]], with every
    * frame keyed by the group — the cumulative join is a group-local
    * range join over the per-group DISTINCT-score frame (bounded by
    * score-domain cardinality per group, hash-partitioned on the group
    * key). Groups with only one class are excluded (AUC undefined). */
  def groupedAuc(df: DataFrame, groupCol: Column, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val rows = df.select(groupCol.as("g"), labelCol.cast("boolean").as("y"),
        scoreCol.as("s"))
      .where(col("g").isNotNull && col("y").isNotNull)
    val byScore = rows.groupBy(col("g"), col("s")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("p"),
      sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    val below = byScore.as("a")
      .join(byScore.select(col("g").as("g2"), col("s").as("s2"), col("n").as("n2")),
        col("g2") === col("a.g") && col("s2") < col("a.s"), "left")
      .select(col("a.g").as("g"), col("a.s").as("s"),
        col("a.p").as("p"), col("a.n").as("n"), col("n2"))
      .groupBy(col("g"), col("s"), col("p"), col("n"))
      .agg(coalesce(sum(col("n2")), lit(0L)).as("neg_below"))
    below.groupBy(col("g"))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * col("neg_below") * 2 + col("p") * col("n")).as("auc_num"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("g").as("group_key"), col("n_pos"), col("n_neg"),
        (col("auc_num").cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"))
  }

  /** Decile lift / cumulative-gains analysis — "if we keep only the
    * top-k% by this score, what fraction of the positives do we
    * capture?", the triage report that decides a quality score's keep
    * threshold. Rows are ranked score-DESC by the distributed exact
    * global rank (range partition + broadcast offsets — no single
    * reducer; ties broken by `idCol` so both engines bucket
    * identically), bucket = ((rank−1)·buckets) div total. Per-bucket and
    * cumulative counts are integers; rate/lift/capture are single IEEE
    * divisions of integer products. The cumulative step self-joins the
    * `buckets`-row frame — constant-size, broadcast. */
  def decileLift(df: DataFrame, labelCol: Column, scoreCol: Column,
      idCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val rows = df.select(labelCol.cast("boolean").as("y"),
      scoreCol.as("s"), idCol.as("id"))
    val (ranked, total) = graft.operators.GlobalRank.withGlobalRankAndCount(
      rows, Seq(col("s").desc, col("id")), "r")
    val byBucket = ranked
      // the exact rank is 0-based; `div` keeps the bucket arithmetic in
      // integers (a double divide would wobble near bucket edges at
      // billion-row totals)
      .select(col("y"), expr(s"(r * $buckets) div ${total}L").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val totals = byBucket.agg(sum(col("n")).as("tot_n"), sum(col("pos")).as("tot_pos"))
    val cum = byBucket.as("a")
      .join(broadcast(byBucket.select(col("bucket").as("b2"), col("pos").as("p2"))),
        col("b2") <= col("a.bucket"))
      .select(col("a.bucket").as("bucket"), col("a.n").as("n"),
        col("a.pos").as("pos"), col("p2"))
      .groupBy(col("bucket"), col("n"), col("pos"))
      .agg(sum(col("p2")).as("cum_pos"))
    cum.crossJoin(broadcast(totals)).select(
      col("bucket"), col("n"), col("pos"), col("cum_pos"),
      (col("pos").cast("double") / col("n").cast("double")).as("pos_rate"),
      ((col("pos") * col("tot_n")).cast("double") /
        (col("n") * col("tot_pos")).cast("double")).as("lift"),
      (col("cum_pos").cast("double") / col("tot_pos").cast("double")).as("cum_capture"))
  }

  /** Two-proportion A/B significance report — the experiment read-out an
    * event pipeline publishes: units are assigned to arms by the md5 hash
    * gate (the [[Sampling.hashGate]] family — how real experiment
    * platforms bucket, and what makes the assignment engine-reproducible),
    * conversion is any row matching `converted`, and the statistic is the
    * squared two-proportion z under the pooled variance,
    * `z² = (p̂a−p̂b)² / (p̂(1−p̂)(1/na+1/nb))` — emitted SQUARED like
    * q_anomaly's z², so no sqrt enters and every operation is an IEEE
    * op on integer-derived doubles in a fixed order (bit-identical in any
    * engine). `significant` is z² ≥ 3.841458820694124 (χ²₁ at α = 0.05).
    *
    * Scale: one map-combined per-unit aggregation (the unit exchange),
    * then one 4-counter rollup — nothing else moves. */
  def abTest(df: DataFrame, unitCol: Column, converted: Column,
      seed: String = "exp"): DataFrame = {
    val perUnit = df.groupBy(unitCol.as("__u"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("__conv"))
      .withColumn("__is_a", Sampling.hashGate(col("__u"), 0.5, seed))
    val c = perUnit.agg(
      sum(when(col("__is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__is_a"), col("__conv")).otherwise(0L)).as("conv_a"),
      sum(when(!col("__is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__is_a"), col("__conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    // degenerate experiments — an empty arm, or pooled p of exactly 0 or
    // 1 (zero pooled variance) — carry NO evidence of a difference: z² is
    // defined as 0 there instead of dividing by zero (ANSI engines error,
    // IEEE ones emit Inf/NaN; both are wrong read-outs)
    val defined = col("n_a") > 0 && col("n_b") > 0 &&
      (col("conv_a") + col("conv_b")) > 0 &&
      (col("conv_a") + col("conv_b")) < (col("n_a") + col("n_b"))
    val z2 = when(defined,
      (pa - pb) * (pa - pb) /
        (pp * (lit(1.0d) - pp) *
          (lit(1.0d) / col("n_a").cast("double") +
            lit(1.0d) / col("n_b").cast("double"))))
      .otherwise(lit(0.0d))
    c.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      z2.as("z2"), (z2 >= lit(3.841458820694124d)).as("significant"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): adjust a
    * per-unit experiment metric `y` by a PRE-EXPERIMENT covariate `x`
    * (`y_adj = y − θ(x − x̄)`, θ = cov(x,y)/var(x)) and report how much
    * metric variance the adjustment removes — the standard way experiment
    * platforms shrink confidence intervals without more traffic (the
    * reduction equals ρ², the squared x–y correlation). Returns one row:
    * unit count, θ, raw and adjusted variance, and the reduction
    * fraction.
    *
    * Determinism: the q_trend_slope discipline — all five moments are
    * EXACT integer sums over integral inputs (pass money as cents), and
    * θ/variances are IEEE ops on those integers in one fixed order, so
    * any engine replays them bit-for-bit. A zero-variance covariate
    * yields θ = 0 and zero reduction (adjustment undefined → no-op), not
    * a division error.
    *
    * Scale: ONE map-combined aggregation over the per-unit frame. The
    * integer moments bound the input domain: with |x|,|y| ≤ B and n
    * units, |Σxy| ≤ n·B² must stay under 2⁶³ — cents-scale metrics
    * support billions of units; rescale the covariate first past that. */
  def cupedAdjustment(units: DataFrame, yCol: Column, xCol: Column): DataFrame = {
    val m = units.agg(
      count(lit(1)).as("n"),
      sum(xCol.cast("long")).as("sx"),
      sum(yCol.cast("long")).as("sy"),
      sum((xCol.cast("long") * xCol.cast("long"))).as("sxx"),
      sum((xCol.cast("long") * yCol.cast("long"))).as("sxy"),
      sum((yCol.cast("long") * yCol.cast("long"))).as("syy"))
    val n = col("n").cast("double")
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varxN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varyN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val theta = when(varxN > 0, covN / varxN).otherwise(lit(0.0d))
    val varRaw = varyN / (n * n)
    val varAdj = when(varxN > 0,
      (varyN - covN * covN / varxN) / (n * n)).otherwise(varRaw)
    val reduction = when(varxN > 0 && varyN > 0,
      covN * covN / (varxN * varyN)).otherwise(lit(0.0d))
    m.select(col("n").as("n_units"), theta.as("theta"),
      varRaw.as("var_raw"), varAdj.as("var_adj"),
      reduction.as("var_reduction"))
  }

  /** Sample-ratio-mismatch (SRM) health check — the FIRST thing a
    * trustworthy experiment platform validates (Kohavi et al.: an arm
    * split that deviates from its design ratio invalidates every
    * downstream read-out, usually from redirect/bot/logging asymmetry):
    * a one-degree χ² of the observed 50/50 unit split,
    * `χ² = (n_a−E)²/E + (n_b−E)²/E` with `E = (n_a+n_b)/2`, flagged at
    * the same 3.84 gate as [[abTest]]. Counts are exact integers; the
    * statistic is four IEEE ops in fixed order. One per-unit distinct +
    * one two-counter rollup. */
  def srmCheck(df: DataFrame, unitCol: Column, seed: String = "exp"): DataFrame = {
    val perUnit = df.select(unitCol.as("__u")).distinct()
      .withColumn("__is_a", Sampling.hashGate(col("__u"), 0.5, seed))
    val c = perUnit.agg(
      sum(when(col("__is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__is_a"), 1L).otherwise(0L)).as("n_b"))
    val e = (col("n_a") + col("n_b")).cast("double") / lit(2.0d)
    val chi2 =
      (col("n_a").cast("double") - e) * (col("n_a").cast("double") - e) / e +
        (col("n_b").cast("double") - e) * (col("n_b").cast("double") - e) / e
    c.select(col("n_a"), col("n_b"), chi2.as("chi2"),
      (chi2 >= lit(3.841458820694124d)).as("srm_detected"))
  }

  /** Per-SEGMENT [[abTest]] — the heterogeneous-treatment-effect read-out
    * (does the win concentrate in one market segment / language /
    * cohort?): the same hash-gated arms and pooled-variance z² computed
    * within every group. Groups whose experiment is degenerate there
    * (empty arm, pooled p of 0 or 1) read z² = 0 by the same contract.
    * One extra groupBy key over [[abTest]]'s two aggregations; the
    * per-group frame is group-domain bounded. */
  def abTestByGroup(df: DataFrame, unitCol: Column, groupCol: Column,
      converted: Column, seed: String = "exp"): DataFrame = {
    val perUnit = df.groupBy(unitCol.as("__u"), groupCol.as("segment"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("__conv"))
      .withColumn("__is_a", Sampling.hashGate(col("__u"), 0.5, seed))
    val c = perUnit.groupBy(col("segment")).agg(
      sum(when(col("__is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__is_a"), col("__conv")).otherwise(0L)).as("conv_a"),
      sum(when(!col("__is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__is_a"), col("__conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val defined = col("n_a") > 0 && col("n_b") > 0 &&
      (col("conv_a") + col("conv_b")) > 0 &&
      (col("conv_a") + col("conv_b")) < (col("n_a") + col("n_b"))
    val z2 = when(defined,
      (pa - pb) * (pa - pb) /
        (pp * (lit(1.0d) - pp) *
          (lit(1.0d) / col("n_a").cast("double") +
            lit(1.0d) / col("n_b").cast("double"))))
      .otherwise(lit(0.0d))
    c.select(col("segment"), col("n_a"), col("conv_a"), col("n_b"),
      col("conv_b"), z2.as("z2"),
      (z2 >= lit(3.841458820694124d)).as("significant"))
  }

  /** Difference-in-differences read-out: units hash-gated into arms (the
    * [[abTest]] assignment), a per-unit integral metric measured in a PRE
    * and a POST period, and the causal estimate
    * `DiD = (ȳ_A,post − ȳ_A,pre) − (ȳ_B,post − ȳ_B,pre)` — the
    * parallel-trends design that removes arm-level baseline differences
    * an A/B read-out absorbs into noise. Returns the four cell means
    * (one IEEE division each, from exact integer sums), the per-arm
    * deltas, and the DiD estimate, all in one fixed operation order.
    *
    * Scale: one map-combined per-unit aggregation, then a one-row rollup
    * of four integer sums + counts. */
  def diffInDiff(units: DataFrame, unitCol: Column, preCol: Column,
      postCol: Column, seed: String = "exp"): DataFrame = {
    val tagged = units.select(unitCol.as("__u"),
      preCol.cast("long").as("__pre"), postCol.cast("long").as("__post"))
      .withColumn("__is_a", Sampling.hashGate(col("__u"), 0.5, seed))
    val c = tagged.agg(
      sum(when(col("__is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__is_a"), col("__pre")).otherwise(0L)).as("sa_pre"),
      sum(when(col("__is_a"), col("__post")).otherwise(0L)).as("sa_post"),
      sum(when(!col("__is_a"), col("__pre")).otherwise(0L)).as("sb_pre"),
      sum(when(!col("__is_a"), col("__post")).otherwise(0L)).as("sb_post"))
    def mean(s: String, n: String) = col(s).cast("double") / col(n).cast("double")
    val dA = mean("sa_post", "n_a") - mean("sa_pre", "n_a")
    val dB = mean("sb_post", "n_b") - mean("sb_pre", "n_b")
    c.select(col("n_a"), col("n_b"),
      mean("sa_pre", "n_a").as("mean_a_pre"),
      mean("sa_post", "n_a").as("mean_a_post"),
      mean("sb_pre", "n_b").as("mean_b_pre"),
      mean("sb_post", "n_b").as("mean_b_post"),
      dA.as("delta_a"), dB.as("delta_b"), (dA - dB).as("did"))
  }

  /** Deterministic SUBSAMPLING-bootstrap confidence interval for a mean
    * metric — the uncertainty band an eval report publishes next to its
    * point estimate (Politis–Romano m-out-of-n subsampling: each of `b`
    * replicas keeps a hash-gated ~`fraction` of rows WITHOUT replacement;
    * the spread of replica means estimates the sampling distribution).
    * Resampling uses the md5-prefix gate family ([[Sampling]]): replica
    * membership is `md5(seed:replica:id)` — reproducible across engines
    * and layouts, unlike any RNG-based bootstrap.
    *
    * Returns one row: the full-data mean, the replica-mean p05/p50/p95
    * (exact order statistics at ranks ceil(0.05·b)/…, selected by
    * row_number over (mean, replica) — tie placement deterministic), and
    * the replica count. `valueCol` must be integral (exact long sums; a
    * money metric should arrive as cents) — each mean is then ONE IEEE
    * division, bit-identical anywhere.
    *
    * Scale: the ×b row multiplication is a broadcast-free per-row explode
    * feeding ONE map-combined (replica) aggregation — b·rows never
    * shuffles raw, only b partial sums per map task do; the b-row means
    * frame then sorts in a single tiny task. */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: Column,
      b: Int = 100, fraction: Double = 0.5, seed: String = "boot"): DataFrame = {
    require(b >= 20, s"need >= 20 replicas for a p05/p95 band, got $b")
    require(fraction > 0.0 && fraction < 1.0, s"fraction in (0,1), got $fraction")
    val threshold = f"${(fraction * 0x100000000L).toLong}%08x"
    // one null policy for both the point estimate and every replica:
    // null metric rows don't exist (a count(*)/sum() split would count
    // them in the denominator only)
    val reps = df.where(valueCol.isNotNull)
      .select(col(idCol).as("__id"), valueCol.cast("long").as("__v"))
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__b"))
      .where(substring(md5(concat_ws(":", lit(seed), col("__b"), col("__id"))), 1, 8)
        < lit(threshold))
      .groupBy(col("__b"))
      .agg((sum(col("__v")).cast("double") / count(lit(1)).cast("double"))
        .as("__mean"))
    val ranked = reps.withColumn("__r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__mean"), col("__b"))))
    val full = df.where(valueCol.isNotNull).agg(
      (sum(valueCol.cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("mean_full"))
    def at(q: Double) = math.ceil(q * b).toLong
    ranked.groupBy()
      .agg(
        max(when(col("__r") === at(0.05), col("__mean"))).as("p05_mean"),
        max(when(col("__r") === at(0.50), col("__mean"))).as("p50_mean"),
        max(when(col("__r") === at(0.95), col("__mean"))).as("p95_mean"),
        count(lit(1)).as("n_replicas"))
      .crossJoin(broadcast(full))
      .select(col("mean_full"), col("p05_mean"), col("p50_mean"),
        col("p95_mean"), col("n_replicas"))
  }
}
