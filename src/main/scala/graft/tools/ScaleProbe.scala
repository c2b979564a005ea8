package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{CorpusPipeline, Dedup, Sampling, Similarity, TextAnalysis}

/** Scaling-curve probe for the heaviest pipelines: times them at 1x/2x/5x
  * the sf0.1 corpus to catch super-linear steps that single-SF numbers
  * cannot (SCALE.md records the findings).
  *
  * Scaled corpora are unions of per-copy ALPHABET-ROTATED documents: a
  * character bijection preserves shingle-set sizes and within-copy Jaccard
  * structure exactly, while making cross-copy texts disjoint — so the
  * near-dup workload (pairs per doc, bucket sizes) scales linearly like a
  * real corpus, instead of quadratically like naive row duplication would.
  * Embedding copies keep the vectors (per-row cost is what's probed) with
  * offset ids; the query set is held CONSTANT so brute-force/IVF timings
  * isolate corpus growth.
  */
object ScaleProbe {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  private def rotated(df: DataFrame, copies: Int, idCol: String, offset: Long): DataFrame = {
    // only 26 distinct rotations exist; past that, copies repeat verbatim
    // and cross-copy exact duplicates make pair volume quadratic — the
    // exact artifact this construction exists to avoid
    require(copies <= 26, s"alphabet rotation supports at most 26 distinct copies, got $copies")
    (0 until copies).map { i =>
      val rot = alpha.drop(i) + alpha.take(i)
      // lang/n_chars ride along unchanged: a character bijection preserves
      // length, so the stored n_chars stays consistent with the rotated text
      df.select(
        (col(idCol) + lit(i * offset)).as(idCol),
        translate(lower(col("text")), alpha, rot).as("text"),
        col("lang"),
        col("source"),
        col("n_chars"))
    }.reduce(_.unionByName(_))
  }

  private def time[A](body: => A): Double = {
    // GC between timed pipelines (outside the timer), for the same reason
    // Bench does it: a shared JVM otherwise bills each pipeline for its
    // neighbors' garbage — the exact-percentile probes allocate hard, and
    // without this the NEXT pipeline's number swings by up to 30x
    System.gc()
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // fail-fast digest resolution + stale-staging GC before any Spark work
    graft.SparkEntry.initStaging()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench's codegen-class cache sizing (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      // match Bench's AQE coalescing floor (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "128k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb0.where(col("vec_id") % 500 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .cache()
    queries.count()

    val factors = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2, 5))
    // optional third arg picks probe groups (comma-joined subset of the
    // default set below, one group per round/wave) — a new group can be
    // re-probed without paying for every earlier curve again
    val groups = args.drop(2).headOption
      .map(_.split(",").map(_.trim).toSet)
      // r13 is deliberately NOT in the default set: its build cells
      // assume the staged artifacts are COLD for this probe dir+factor,
      // which only holds when no earlier group (r12b runs the same
      // queries) touched them in the same factor iteration — run it
      // alone: `ScaleProbe <dir> <factors> r13`
      .getOrElse(Set("corpus", "r5", "r5c", "r5d", "r6", "r7", "r7b", "r7c", "r7d", "r7e", "r7f", "r7g", "r7h", "r7i", "r8", "r8b", "r8c", "r8d", "r8e", "r8f", "r9", "r11", "r11b", "r12", "r12b"))
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate",
        "l_extendedprice")
    val ev0 = graft.sources.Tables.events(spark, dir)
    val or0 = spark.read.parquet(s"$dir/orders.parquet")
    val pa0 = spark.read.parquet(s"$dir/part.parquet")
    val cu0 = spark.read.parquet(s"$dir/customer.parquet")
    val na0 = spark.read.parquet(s"$dir/nation.parquet")
    val re0 = spark.read.parquet(s"$dir/region.parquet")

    for (f <- factors) {
      // stage the scaled corpus to parquet so every timed pipeline starts
      // from a plain columnar scan, same as the benchmarked queries. The
      // staged dir mirrors the testdata layout (<t>.parquet) so
      // SparkEntry.queries run against it unmodified.
      val base = s"/tmp/graft_scale/sf_x$f"
      val dPath = s"$base/documents.parquet"
      val ePath = s"$base/embeddings.parquet"
      // lineitem-only waves (r15 runs at factors past the 26-rotation
      // ceiling) skip the corpus/dimension staging entirely — the
      // co-purchase A/B reads nothing but lineitem, and staging a 50×
      // document corpus it never scans would dominate the probe's
      // wall-clock AND trip `rotated`'s distinct-copy guard
      val liOnly = groups.subsetOf(Set("r15"))
      if (!liOnly) {
      rotated(docs0, f, "doc_id", 10_000_000L).write.mode("overwrite").parquet(dPath)
      (0 until f).map(i => emb0.select((col("vec_id") + lit(i * 10_000_000L)).as("vec_id"),
          col("embedding")))
        .reduce(_.unionByName(_)).write.mode("overwrite").parquet(ePath)
      }
      // lineitem copies get a per-copy price PERTURBATION so the DISTINCT
      // value count grows with the factor — duplicated values would let the
      // exact-percentile buffer stay constant and hide exactly the
      // continuous-domain growth this probe exists to measure
      // partkey offsets keep per-copy co-purchase graphs DISJOINT — shared
      // partkeys would densify one graph instead of scaling n components
      (0 until f).map(i => li0.select(
          (col("l_orderkey") + lit(i * 100_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 100_000_000L)).as("l_partkey"),
          // suppkey offsets grow the z-order's second dimension's domain
          // with the factor (a pinned domain would hide ordinal-scaling
          // cost in the q_zorder probe)
          (col("l_suppkey") + lit(i * 100_000_000L)).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
          (col("l_extendedprice") + lit(i * 0.0001d)).as("l_extendedprice")))
        .reduce(_.unionByName(_)).write.mode("overwrite").parquet(s"$base/lineitem.parquet")
      if (!liOnly) {
      // events pass through Tables.events FIRST so ts is staged as a micros
      // timestamp (staging the raw nanos long would be double-converted on
      // re-read); user offsets grow the window-partition count linearly
      (0 until f).map(i => ev0.select(
          (col("event_id") + lit(i * 100_000_000L)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i * 1_000_000L)).as("user_id"),
          col("event_type"), col("value"), col("props")))
        .reduce(_.unionByName(_)).write.mode("overwrite").parquet(s"$base/events.parquet")
      // orders: offset BOTH keys — duplicated custkeys would pin the
      // profile's distinct counts at 1x and hide cardinality growth
      (0 until f).map(i => or0
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100_000_000L))
          .withColumn("o_custkey", col("o_custkey") + lit(i * 100_000_000L)))
        .reduce(_.unionByName(_)).write.mode("overwrite").parquet(s"$base/orders.parquet")
      // part/customer: key offsets MATCH lineitem's and orders' so every
      // FK relation stays intact per copy (the RI audit must keep finding
      // zero orphans at every factor — a broken offset would instead time
      // an ever-growing orphan set). Part names are alphabet-rotated like
      // documents: each copy brings a DISJOINT name dictionary, so the
      // fuzzy-match dictionary and its blocks grow linearly with the
      // factor instead of pinning at the 1x vocabulary.
      (0 until f).map { i =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        pa0.withColumn("p_partkey", col("p_partkey") + lit(i * 100_000_000L))
          .withColumn("p_name", translate(col("p_name"), alpha, rot))
      }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(s"$base/part.parquet")
      (0 until f).map(i => cu0
          .withColumn("c_custkey", col("c_custkey") + lit(i * 100_000_000L)))
        .reduce(_.unionByName(_)).write.mode("overwrite").parquet(s"$base/customer.parquet")
      na0.write.mode("overwrite").parquet(s"$base/nation.parquet")
      re0.write.mode("overwrite").parquet(s"$base/region.parquet")
      }
      // lazy: a lineitem-only wave never stages (or reads) the corpus
      lazy val docs = spark.read.parquet(dPath)
      lazy val emb = spark.read.parquet(ePath)

      if (groups("corpus")) {
      val tMinhash = time(force(Dedup.minhashNearDuplicates(
        docs, "doc_id", "text", 5, 128, 16, 0.5)))
      val tClusters = time(force(Dedup.resolveDuplicateClusters(
        Dedup.minhashNearDuplicates(docs, "doc_id", "text", 5, 128, 16, 0.5))))
      val tFunnel = time(force(CorpusPipeline.funnel(docs, "doc_id", "text")))
      val tRepetition = time(force(TextAnalysis.repetitionProfile(docs, "doc_id", "text")))
      val tTopTerms = time(force(TextAnalysis.topTerms(docs, "doc_id", "text", 3)))
      val tIvf = time(force(Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nlist = 16, nprobe = 8)))
      val tIndex = time(force(TextAnalysis.invertedIndex(docs, "doc_id", "text", 20)))
      val tPack = time(force(TextAnalysis.packSequences(docs, "doc_id", "text", "source", 2048)))
      // cross-corpus bloom: even ids are the reference, odd ids the batch —
      // times the full operator including the sketch build
      val tBloom = time(force(Dedup.crossCorpusNearDuplicatesBloom(
        docs.where(col("doc_id") % 2 === 1), docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", 5, 128, 16, 0.5)))
      // line-wise stage rides one line-hash exchange; pair volume is
      // linear in corpus lines (rotation keeps cross-copy lines disjoint)
      val tLines = time(force(Dedup.duplicateLineProfile(docs, "doc_id", "text", 10)))
      // bench side held at the same 5% gate: the broadcast gram set grows
      // with the corpus here (worst case); real eval suites are constant
      val tContam = time(force(TextAnalysis.benchmarkOverlap(
        docs.where(!Sampling.hashGate(col("doc_id"), 0.05, "bench")),
        docs.where(Sampling.hashGate(col("doc_id"), 0.05, "bench")),
        "doc_id", "text", 3, 0.2)))
      println(f"""SCALE {"factor":$f, "minhash":$tMinhash%.2f, "clusters":$tClusters%.2f, "funnel":$tFunnel%.2f, "repetition":$tRepetition%.2f, "top_terms":$tTopTerms%.2f, "ivf_topk":$tIvf%.2f, "inverted_index":$tIndex%.2f, "pack":$tPack%.2f, "cross_bloom":$tBloom%.2f, "line_dedup":$tLines%.2f, "contamination":$tContam%.2f}""")
      }

      // round-4/5 additions, probed through the REAL query closures over
      // the mirrored dir — exact vs approx percentile side by side (the
      // continuous-domain buffer story), plus the window/split operators
      def tq(name: String): Double =
        time(force(graft.SparkEntry.queries(name)(spark, base)))
      if (groups("r5")) {
      val tWins = tq("q_winsorize"); val tWinsA = tq("q_winsorize_approx")
      val tMad = tq("q_mad_outliers"); val tMadA = tq("q_mad_outliers_approx")
      val tBuckets = tq("q_length_buckets"); val tSplit = tq("q_leakage_safe_split")
      // round-5 operators: unigram LM through the real query closure; the
      // SemDeDup probe scales nlist ~ sqrt(rows) (the balanced-IVF knob:
      // nlist ∝ rows makes ASSIGNMENT cost rows·nlist ∝ rows² — measured
      // 23x at 5x before this was fixed — while fixed nlist makes cluster
      // SIZE, and so pair-join work, grow linearly; √N equalizes the two
      // at N^1.5 total, the standard IVF operating point. The query's
      // fixed nlist=16 is an SF-pinned oracle setting.)
      val tUnigram = tq("q_unigram_lm")
      val tSemantic = time(force(Dedup.semanticNearDuplicates(
        emb, "vec_id", "embedding",
        nlist = 16 * math.sqrt(f.toDouble).ceil.toInt, threshold = 0.9)))
      println(f"""SCALE_R5 {"factor":$f, "winsorize":$tWins%.2f, "winsorize_approx":$tWinsA%.2f, "mad":$tMad%.2f, "mad_approx":$tMadA%.2f, "length_buckets":$tBuckets%.2f, "leakage_split":$tSplit%.2f, "unigram_lm":$tUnigram%.2f, "semantic_dedup":$tSemantic%.2f}""")
      }

      // round-5 graph / event / retrieval operators through their real
      // query closures (q_containment is deliberately absent: its query is
      // the doc_id<200-bounded exact twin, so a corpus-factor probe would
      // time a constant; the posting-join scale knob is the stop-gram df
      // ceiling documented on the query)
      if (groups("r5c")) {
      val tPr = tq("q_pagerank"); val tTri = tq("q_triangles")
      val tLp = tq("q_label_prop"); val tScd = tq("q_scd2")
      val tFun = tq("q_funnel"); val tCoh = tq("q_cohort_retention")
      val tPsi = tq("q_drift_psi"); val tProf = tq("q_column_profile")
      val tBm = tq("q_bm25"); val tRrf = tq("q_rrf_hybrid")
      println(f"""SCALE_R5C {"factor":$f, "pagerank":$tPr%.2f, "triangles":$tTri%.2f, "label_prop":$tLp%.2f, "scd2":$tScd%.2f, "funnel":$tFun%.2f, "cohort":$tCoh%.2f, "drift_psi":$tPsi%.2f, "column_profile":$tProf%.2f, "bm25":$tBm%.2f, "rrf_hybrid":$tRrf%.2f}""")
      }

      // round-11 session-2 rewrites through their real query closures:
      // the join-free FK sketch (tagged group-max provenance), the
      // histogram-pushdown exact percentiles, and PPR with the certified
      // no-dangling contract + src-side seed derivation. PPR's first
      // factor cell pays the per-dir bucketed bipartite staging write
      // (same accounting as pagerank's r5c cell); percentile's pays the
      // pricecnt staging (winsorize in r5 pays it when both groups run).
      if (groups("r11b")) {
      val tFk = tq("q_fk_sketch"); val tPct = tq("q_percentile")
      val tPpr = tq("q_ppr")
      println(f"""SCALE_R11B {"factor":$f, "fk_sketch":$tFk%.2f, "percentile":$tPct%.2f, "ppr":$tPpr%.2f}""")
      }

      // round-12: the df-order vs hash-order exact prefix join on a
      // SKEWED vocabulary — the documented hash-order caveat ("candidate
      // volume grows on Zipfian token distributions because a hash
      // prefix is a uniform sample while a rarest-first prefix excludes
      // head tokens"), asserted since round 11 but never measured. The
      // skewed twin prepends ONE UNROTATED phrase to every 16th doc: its
      // ~12 interior word-3-shingles become a Zipf head whose df grows
      // linearly with the corpus (shared across rotation copies), while
      // the rest of the vocabulary stays rotation-disjoint. Four cells
      // per factor: each variant on the uniform and the skewed corpus —
      // the uniform pair prices the df variant's fixed dictionary
      // passes, the skewed pair prices the hash variant's candidate
      // blowup; the crossover feeds the selection rule on
      // Dedup.hashOrderJaccardPairs' scaladoc.
      if (groups("r12")) {
      val phrase = "the quick brown fox jumps over the lazy dog and then " +
        "runs far away into the deep dark wood tonight "
      val sk = docs.withColumn("text",
        when(col("doc_id") % 16 === 0, concat(lit(phrase), col("text")))
          .otherwise(col("text")))
      val tDfSkew = time(force(Dedup.prefixFilterJaccardPairs(
        sk, "doc_id", "text", ngram = 3, threshold = 0.4)))
      val tHashSkew = time(force(Dedup.hashOrderJaccardPairs(
        sk, "doc_id", "text", ngram = 3, threshold = 0.4)))
      val tDfUni = time(force(Dedup.prefixFilterJaccardPairs(
        docs, "doc_id", "text", ngram = 3, threshold = 0.4)))
      val tHashUni = time(force(Dedup.hashOrderJaccardPairs(
        docs, "doc_id", "text", ngram = 3, threshold = 0.4)))
      println(f"""SCALE_R12 {"factor":$f, "df_skew":$tDfSkew%.2f, "hash_skew":$tHashSkew%.2f, "df_uniform":$tDfUni%.2f, "hash_uniform":$tHashUni%.2f}""")
      }

      // round-12b: the staged query paths through their REAL closures —
      // each pair of cells separates the ingest-time staging build (first
      // call on a fresh probe dir: artifact derivation + parquet write)
      // from the warm steady state every later call pays. Both curves
      // must stay ~linear: the builds are dictionary/rank/extraction
      // passes with no quadratic step, the warm paths are the staged
      // scans + per-call machinery. The build cells are GENUINE builds
      // on every probe run: the loop above rewrites the probe dir's
      // parquet before the groups execute, so the input fingerprint
      // changes and any prior staging is invalidated — a pre-existing
      // warm marker cannot masquerade as a build. q_html_extract runs
      // AFTER the funnel,
      // so its cells price the pure staged READ (the funnel's build cell
      // already paid the shared webprod staging).
      // The warm cells are NAMED for their tier (r13 verdict #6): they
      // measure the IN-PROCESS stagedRefs fast path — they skip the
      // cross-JVM reuse probe (marker read + O(#files) input-fingerprint
      // walk + bucketed-table re-register/count), so they UNDERSTATE what
      // a fresh JVM pays on first touch of a warm staging. The r13 group's
      // three-tier cells (build / warm_xjvm / warm_inproc) are the
      // authoritative staged-path price; these curves exist for the
      // build-vs-steady-state LINEARITY claim only.
      if (groups("r12b")) {
      def tq2(name: String): (Double, Double) = { val a = tq(name); (a, tq(name)) }
      val (pjB, pjW) = tq2("q_prefix_join")
      val (erB, erW) = tq2("q_er_pipeline")
      val (wfB, wfW) = tq2("q_web_corpus_funnel")
      val (heB, heW) = tq2("q_html_extract")
      println(f"""SCALE_R12B {"factor":$f, "prefix_join_build":$pjB%.2f, "prefix_join_warm_inproc":$pjW%.2f, "er_build":$erB%.2f, "er_warm_inproc":$erW%.2f, "funnel_build":$wfB%.2f, "funnel_warm_inproc":$wfW%.2f, "html_extract_read1_inproc":$heB%.2f, "html_extract_read2_inproc":$heW%.2f}""")
      }

      // round-5 second wave: relational/statistical + linkage + BFS —
      // all through the real query closures. The RI audit must stay
      // orphan-free at every factor (the staging offsets preserve FKs);
      // the fuzzy dictionary grows linearly by rotation; BFS explores one
      // copy's component while the edge projection it sits on scales with
      // the whole corpus.
      if (groups("r5d")) {
      val tTrend = tq("q_trend_slope"); val tTrans = tq("q_event_transitions")
      val tBfs = tq("q_bfs_dist"); val tFuzzy = tq("q_fuzzy_match")
      val tRi = tq("q_ri_audit")
      println(f"""SCALE_R5D {"factor":$f, "trend_slope":$tTrend%.2f, "event_transitions":$tTrans%.2f, "bfs_dist":$tBfs%.2f, "fuzzy_match":$tFuzzy%.2f, "ri_audit":$tRi%.2f}""")
      }

      // round-6: star-contraction components (time AND round count — the
      // O(log n) claim made measurable; per-copy graphs are disjoint, so
      // the factor scales component COUNT while round count should stay
      // ~flat at the largest component's log-size) and the distributed
      // sorted-neighborhood (the former single-reducer global window;
      // part-name rotation grows its dictionary linearly with the factor)
      if (groups("r6")) {
      val liG = spark.read.parquet(s"$base/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
      val pairsG = liG.as("x").join(liG.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 2)
      var ccRounds = 0
      val tCc = time {
        val (lbl, r) = graft.graph.GraphOps
          .connectedComponentsStarWithRounds(pairsG, "pa", "pb")
        ccRounds = r
        force(lbl)
      }
      val tSn = tq("q_sorted_neighborhood")
      // round-6 additions through their real query closures: the global
      // rank (curriculum) works over the rotated corpus (linear rows),
      // keep-best rides the minhash cluster pipeline, snapshot diff is
      // two hash-reduced scans + one id join
      val tCur = tq("q_curriculum")
      val tKb = tq("q_dedup_keep_best")
      val tSd = tq("q_snapshot_diff")
      val tIa = tq("q_incremental_agg")
      val tId = tq("q_incremental_distinct")
      println(f"""SCALE_R6 {"factor":$f, "components_star":$tCc%.2f, "star_rounds":$ccRounds, "sorted_neighborhood":$tSn%.2f, "curriculum":$tCur%.2f, "keep_best":$tKb%.2f, "snapshot_diff":$tSd%.2f, "incr_agg":$tIa%.2f, "incr_distinct":$tId%.2f}""")
      }

      // round-7: the two skew defenses on the co-purchase wedge
      // projection, each probed against its unprotected control arm on a
      // PLANTED worst case (the organic TPC-ish fixture never triggers
      // either — baskets are ≤ ~7 items — which is exactly why the probe
      // plants one).
      if (groups("r7")) {
      import graft.graph.GraphOps
      // (a) mega-basket: one order holding 2000·f distinct parts on top
      // of the organic staged lineitem. The capped projection drops it
      // (time stays flat, the organic-projection cost); the uncapped
      // pair join must materialize (2000·f choose 2) ≈ 2e6·f² rows from
      // that ONE join key — the quadratic arm, measured as rows + time.
      val hub = 2000L * f
      val mega = spark.range(hub).select(
        lit(999_999_999L).as("l_orderkey"),
        (col("id") + 500_000_000L).as("l_partkey"))
      val liP = spark.read.parquet(s"$base/lineitem.parquet")
        .select("l_orderkey", "l_partkey").unionByName(mega)
      val tCapped = time(force(GraphOps.coOccurrencePairs(
        liP, "l_orderkey", "l_partkey", minShared = 2, maxGroupSize = 256)))
      var uncappedRows = 0L
      val tUncapped = time {
        val d = liP.distinct()
        uncappedRows = force(d.as("x").join(d.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey")))
      }
      // (b) hot NODE in the projected graph: a star of 4000·f leaves
      // around a mid-id hub plus a leaf ring (so triangle counts are
      // nonzero). Degree orientation gives the hub out-degree 0 — wedge
      // volume O(h) — while the id-oriented control arm routes
      // (h/2)² ≈ 4e6·f² wedges through the hub's id. Same output either
      // way (GraphOpsSpec pins equality); only the join volume differs.
      val h = 4000L * f
      val mid = h / 2
      val ids = spark.range(h + 1).where(col("id") =!= mid)
      val starE = ids.select(col("id").as("pa"), lit(mid).as("pb"))
        .unionByName(ids.select(col("id").as("pa"), (col("id") + 1).as("pb"))
          .where(col("pb") =!= mid && col("pb") <= h))
      starE.write.mode("overwrite").parquet(s"$base/star_edges.parquet")
      val starRead = spark.read.parquet(s"$base/star_edges.parquet")
      val tTriDeg = time(force(GraphOps.triangleCounts(starRead, "pa", "pb")))
      // control arm: the pre-r7 id-oriented closure (wedges through the
      // MIDDLE vertex of each a<b<c path — volume Σ_b indeg·outdeg)
      val tTriId = time {
        val e = starRead.select(
            least(col("pa"), col("pb")).as("a"),
            greatest(col("pa"), col("pb")).as("b"))
          .where(col("a") =!= col("b")).distinct()
        force(e.as("e1")
          .join(e.as("e2"), col("e1.b") === col("e2.a"))
          .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("node_id"))
          .groupBy(col("node_id")).agg(count(lit(1)).as("n_triangles")))
      }
      println(f"""SCALE_R7 {"factor":$f, "mega_basket_items":$hub, "capped_proj":$tCapped%.2f, "uncapped_pair_join":$tUncapped%.2f, "uncapped_pair_rows":$uncappedRows, "star_leaves":$h, "tri_deg_oriented":$tTriDeg%.2f, "tri_id_oriented":$tTriId%.2f}""")
      }

      // round-7 second wave, all through the real query closures on the
      // mirrored dir. Rotation makes the curves honest: prefix-join pair
      // volume and substring-dup gram collisions stay linear (cross-copy
      // tokens/grams are disjoint); the heavy-hitter dictionary is
      // constant (event types don't rotate) so MG cost is pure scan; the
      // k-anonymity crowd tables stay domain-bounded while the fact scan
      // grows; z-order ordinals rescale to the growing suppkey domain;
      // balanced-shards ranks linearly more rows through the same range
      // exchange.
      if (groups("r7b")) {
      val tPfx = tq("q_prefix_join")
      val tSub = tq("q_substring_dup")
      val tHh = tq("q_heavy_hitters")
      val tKa = tq("q_k_anonymity")
      val tZo = tq("q_zorder")
      val tBs = tq("q_balanced_shards")
      // k-core over the scaled co-purchase projection: per-copy graphs
      // are DISJOINT, so peel depth (round count) should stay flat while
      // per-round cost grows linearly — the same claim shape as the
      // star-contraction round probe
      var kcRounds = 0
      val tKc = time {
        val pairs = graft.graph.GraphOps.coOccurrencePairs(
          spark.read.parquet(s"$base/lineitem.parquet")
            .select("l_orderkey", "l_partkey"),
          "l_orderkey", "l_partkey", minShared = 2, maxGroupSize = 256)
        val (core, r) = graft.graph.GraphOps.kCoreWithRounds(pairs, "pa", "pb", k = 3)
        kcRounds = r
        force(core)
      }
      println(f"""SCALE_R7B {"factor":$f, "prefix_join":$tPfx%.2f, "substring_dup":$tSub%.2f, "heavy_hitters":$tHh%.2f, "k_anonymity":$tKa%.2f, "zorder":$tZo%.2f, "balanced_shards":$tBs%.2f, "k_core":$tKc%.2f, "k_core_rounds":$kcRounds}""")
      }

      // round-7 third wave through the real query closures. JSONL is
      // timed on its SECOND call: the first pays the one-time staging
      // write (the same once-per-dir discipline as the bucketed
      // reference), so the recorded number is the read+aggregate path a
      // warm pipeline actually runs.
      if (groups("r7c")) {
      val tDs = tq("q_dup_spans")
      val tFd = tq("q_fd_discovery")
      tq("q_jsonl_roundtrip") // staging write, unrecorded
      val tJr = tq("q_jsonl_roundtrip")
      val tLd = tq("q_l_diversity")
      val tZq = tq("q_zorder_quantile")
      println(f"""SCALE_R7C {"factor":$f, "dup_spans":$tDs%.2f, "fd_discovery":$tFd%.2f, "jsonl_roundtrip":$tJr%.2f, "l_diversity":$tLd%.2f, "zorder_quantile":$tZq%.2f}""")
      }

      // round-7 fourth wave through the real query closures. The staging
      // keeps each curve honest: link-prediction wedges stay linear
      // (per-copy co-purchase graphs are disjoint), the incremental-median
      // state grows with the copies' disjoint returnflag×quantity domain
      // (quantity is shared but flags aren't rotated — state rows grow
      // sub-linearly, merge cost ∝ state), EWMA partitions grow with the
      // offset user ids, anomaly windows grow rows under a CONSTANT type
      // dictionary, negative sampling's anchor × part grid grows on both
      // sides (the hash gate keeps candidates ∝ grid/40), ORC is timed on
      // its second call (first pays the one-time staging write, same
      // discipline as JSONL), and the deflate scan is pure per-row work.
      if (groups("r7d")) {
      // the first graph query stages the shared co-purchase projection
      // (once per JVM+dir) — warm it unrecorded so each curve below times
      // the operator, not the one-time staging write (the ORC/JSONL
      // discipline)
      tq("q_walk_centrality")
      val tLp = tq("q_link_predict")
      val tIm = tq("q_incremental_median")
      val tTc = tq("q_t_closeness")
      val tEw = tq("q_ewma")
      val tAn = tq("q_anomaly")
      val tNs = tq("q_negative_sample")
      tq("q_orc_roundtrip") // staging write, unrecorded
      val tOrc = tq("q_orc_roundtrip")
      val tCr = tq("q_compression_ratio")
      // wave 2: walk frontiers stay seed-count-sized against the linearly
      // growing ranked adjacency; correlation's pair grid is type² —
      // constant — over linearly more hours; zone-prune aggregates the
      // 64-file profile both ways
      val tRw = tq("q_random_walks")
      val tCo = tq("q_correlation")
      val tZp = tq("q_zone_prune")
      println(f"""SCALE_R7D {"factor":$f, "link_predict":$tLp%.2f, "incremental_median":$tIm%.2f, "t_closeness":$tTc%.2f, "ewma":$tEw%.2f, "anomaly":$tAn%.2f, "negative_sample":$tNs%.2f, "orc_roundtrip":$tOrc%.2f, "compression_ratio":$tCr%.2f, "random_walks":$tRw%.2f, "correlation":$tCo%.2f, "zone_prune":$tZp%.2f}""")
      }

      // round-7 fifth wave: the AC blocklist scan is pure per-row work
      // over linearly more documents; the walk-derived queries ride the
      // staged projection (warmed above when r7d ran — warm again here so
      // the group stands alone); attribution is one user join + window;
      // imputation is a broadcast-median fact scan
      if (groups("r7e")) {
      tq("q_walk_centrality") // stages the shared projection if r7d didn't
      val tBl = tq("q_blocklist")
      val tWc = tq("q_walk_centrality")
      val tSg = tq("q_skipgram_pairs")
      val tAt = tq("q_attribution")
      val tIp = tq("q_impute_median")
      // wave 6: modularity reuses the staged projection + label rounds;
      // PMI is two vocabulary-bounded count exchanges; funnel latency is
      // two keyed min-aggregations and a single-row percentile
      val tMo = tq("q_modularity")
      val tPm = tq("q_pmi_bigrams")
      val tFl = tq("q_funnel_latency")
      val tAs = tq("q_assortativity")
      val tFc = tq("q_fd_composite")
      val tCc2 = tq("q_clustering_coeff")
      val tIc = tq("q_incremental_copurchase")
      println(f"""SCALE_R7E {"factor":$f, "blocklist":$tBl%.2f, "walk_centrality":$tWc%.2f, "skipgram_pairs":$tSg%.2f, "attribution":$tAt%.2f, "impute_median":$tIp%.2f, "modularity":$tMo%.2f, "pmi_bigrams":$tPm%.2f, "funnel_latency":$tFl%.2f, "assortativity":$tAs%.2f, "fd_composite":$tFc%.2f, "clustering_coeff":$tCc2%.2f, "incremental_copurchase":$tIc%.2f}""")
      }

      // round-7 sixth wave: SCC is probed on the UNFILTERED consecutive-
      // pick digraph (the query's partkey<=400 oracle cap would pin the
      // probe to copy 0 — staged copies offset partkeys, so the capped
      // query can't grow; the operator must). Disjoint copies scale the
      // SCC COUNT, not any component's depth, so peel/round counts should
      // stay flat while per-round join cost grows linearly — the star-CC
      // claim shape, directed. Compaction keeps a CONSTANT file count
      // (ship-date domain doesn't grow) over linearly more rows — the
      // groupBy dominates, the prefix sum is date-domain-bounded. Audio
      // stats is a pure per-row decode scan over linearly more documents.
      if (groups("r7f")) {
      var sccPeels = 0; var sccRounds = 0
      val tScc = time {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_partkey"))
        val e = spark.read.parquet(s"$base/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("prev", lag(col("l_partkey"), 1).over(w))
          .where(col("prev").isNotNull && col("prev") =!= col("l_partkey"))
          .select(col("prev").as("src"), col("l_partkey").as("dst"))
          .distinct()
        val (labels, p, r) = graft.graph.GraphOps
          .stronglyConnectedComponentsWithStats(e, "src", "dst",
            maxPeels = 60, maxRounds = 2000)
        sccPeels = p; sccRounds = r
        force(labels)
      }
      val tCp = tq("q_compaction_plan")
      val tAu = tq("q_audio_stats")
      // PQ encode: a pure per-row unrolled-literal projection — linear by
      // construction. (q_pq_topk is NOT probed through the staged dirs:
      // the staging grows the % 50 query set linearly alongside the
      // corpus, so its probe curve would measure the quadratic
      // queries x corpus grid, not the operator — the production axis is
      // corpus with a bounded query batch.)
      val tPq = tq("q_pq_codes")
      println(f"""SCALE_R7F {"factor":$f, "scc":$tScc%.2f, "scc_peels":$sccPeels, "scc_rounds":$sccRounds, "compaction_plan":$tCp%.2f, "audio_stats":$tAu%.2f, "pq_codes":$tPq%.2f}""")
      }

      // round-7 seventh wave, through the real query closures. Honest
      // axes under rotation: frame sampling and dp release are pure
      // scans (groups are domain-bounded for dp, so only the scan
      // grows); assoc rules ride DISJOINT per-copy baskets (pair volume
      // linear — the staged basket projection is warmed first so the
      // timed run measures the rule pipeline, not the one-time stage);
      // golden record fans 1-3 versions per rotated customer; phrase
      // search postings grow linearly (per-copy texts reuse the same
      // vocabulary, so the two query terms' lists scale with the
      // corpus); pattern match is one user-window pass over linearly
      // more users; profile drift is two unpivot scans whose distinct
      // exchange grows with the corpus.
      if (groups("r7g")) {
      val tFs = tq("q_frame_sample")
      tq("q_assoc_rules") // stage the basket projection outside the timing
      val tAr = tq("q_assoc_rules")
      val tDp = tq("q_dp_release")
      val tGr = tq("q_golden_record")
      val tPs = tq("q_phrase_search")
      val tPt = tq("q_pattern_match")
      val tPd = tq("q_profile_drift")
      println(f"""SCALE_R7G {"factor":$f, "frame_sample":$tFs%.2f, "assoc_rules":$tAr%.2f, "dp_release":$tDp%.2f, "golden_record":$tGr%.2f, "phrase_search":$tPs%.2f, "pattern_match":$tPt%.2f, "profile_drift":$tPd%.2f}""")
      }

      // round-7 eighth wave. Axes: closeness and k-truss ride the staged
      // co-purchase projection (disjoint per-copy graphs — seed count
      // and triangle structure scale with copies, truss peel depth does
      // not); the ER pipeline's global ranks and jw scoring grow with
      // the rotated part dictionary; classifier eval's AUC join is
      // score-domain-bounded while its scan grows; decile lift is the
      // exact-rank machinery end to end; partition-prune reads ONE
      // language's directories of a corpus that grows linearly;
      // pack_bpe is a per-source window over native-BPE-counted rows
      // (warm the staged partitioned layout outside the timing, as r7g
      // does for baskets).
      if (groups("r7h")) {
      tq("q_partition_prune") // stage the lang=... layout unrecorded
      val tPp = tq("q_partition_prune")
      val tCl = tq("q_closeness")
      val tKt = tq("q_k_truss")
      val tEr = tq("q_er_pipeline")
      val tCe = tq("q_classifier_eval")
      val tDl = tq("q_decile_lift")
      val tPb = tq("q_pack_bpe")
      println(f"""SCALE_R7H {"factor":$f, "partition_prune":$tPp%.2f, "closeness":$tCl%.2f, "k_truss":$tKt%.2f, "er_pipeline":$tEr%.2f, "classifier_eval":$tCe%.2f, "decile_lift":$tDl%.2f, "pack_bpe":$tPb%.2f}""")
      }

      // round-8 wave. Axes: the three web queries are per-row regex
      // projections (+ one domain exchange for the rollup) over linearly
      // more pages — flat-per-row is the claim; the bucket join is timed
      // on its SECOND call (first pays the one-time bucketed staging
      // write, the JSONL/ORC discipline) and its join moves no fact rows;
      // the image FINGERPRINT scan (synth+decode+dHash — the expensive
      // image pass the staged fp table amortizes) is probed instead of
      // the near-dup pair join, whose PAIR volume under copies is a
      // fixture artifact (doc_id%50 repeats per copy, multiplying planted
      // dup groups — a real corpus grows groups, not group sizes).
      if (groups("r8")) {
      val tHe = tq("q_html_extract")
      val tUn = tq("q_url_normalize")
      val tDo = tq("q_domain_profile")
      tq("q_bucket_join") // bucketed staging write, unrecorded
      val tBj = tq("q_bucket_join")
      val tFp = time(force(graft.ext.Multimodal.imageFingerprints(
        graft.ext.Multimodal.synthesizeGradientImages(
          docs.select(col("doc_id")), "doc_id"))))
      println(f"""SCALE_R8 {"factor":$f, "html_extract":$tHe%.2f, "url_normalize":$tUn%.2f, "domain_profile":$tDo%.2f, "bucket_join":$tBj%.2f, "image_fingerprints":$tFp%.2f}""")
      }

      // round-8 second wave. Axes: expectations is one map-combined scan
      // + a key-only FK anti-join (linear, dims constant); dynamic-prune
      // reads ONE language's partition dirs of a linearly growing layout
      // (warm the staged layout first, the partition-prune discipline);
      // quarantine and fertility are per-row scans (fertility's BPE
      // kernel is the heavy one — the merge table is CONSTANT, trained
      // once on the bounded doc_id<50 sample); novelty is one gram
      // exchange growing linearly (rotation keeps cross-copy grams
      // disjoint, so first-occurrence attribution stays within copies);
      // embedding_stats is a rows x dims aggregation + per-row cosine;
      // the split audit rides the staged pair set (warm it via the
      // cheapest consumer first so the probe times the audit, not the
      // one-time staging write).
      if (groups("r8b")) {
      val tEx = tq("q_expectations")
      tq("q_partition_prune") // stage the lang=... layout unrecorded
      val tDy = tq("q_dynamic_prune")
      val tJq = tq("q_jsonl_quarantine")
      val tNo = tq("q_ngram_novelty")
      val tEs = tq("q_embedding_stats")
      val tTf = tq("q_tokenizer_fertility")
      tq("q_minhash_near_dup") // stage the pair set unrecorded
      val tSa = tq("q_split_leakage_audit")
      println(f"""SCALE_R8B {"factor":$f, "expectations":$tEx%.2f, "dynamic_prune":$tDy%.2f, "jsonl_quarantine":$tJq%.2f, "ngram_novelty":$tNo%.2f, "embedding_stats":$tEs%.2f, "tokenizer_fertility":$tTf%.2f, "split_leakage_audit":$tSa%.2f}""")
      }

      // round-8 third wave. Axes: the PIT join and label window are
      // per-user equi-joins with range predicates (users and their
      // events both grow linearly; per-user version/purchase counts are
      // constant under user-offset staging); rolling features is one
      // user exchange + in-partition range frame; calibration and the
      // source-term rank are bounded-key rollups over linear scans; the
      // equi-depth histogram is the distributed rank machinery end to
      // end (range exchange + partitioned window + broadcast offsets —
      // the probe would expose any single-reducer regression
      // immediately).
      if (groups("r8c")) {
      val tPj = tq("q_pit_join")
      val tRf = tq("q_rolling_features")
      val tLw = tq("q_label_window")
      val tCc = tq("q_calibration_curve")
      val tSt = tq("q_source_top_terms")
      val tEd = tq("q_equidepth_hist")
      println(f"""SCALE_R8C {"factor":$f, "pit_join":$tPj%.2f, "rolling_features":$tRf%.2f, "label_window":$tLw%.2f, "calibration_curve":$tCc%.2f, "source_top_terms":$tSt%.2f, "equidepth_hist":$tEd%.2f}""")
      }

      // round-7 ninth (final) wave: the sliced-AUC join is bounded by
      // per-group score domains (groups constant, scans linear); the
      // dataset card is three map-combined aggregations whose only
      // growing term is the md5 dup-group exchange.
      if (groups("r7i")) {
      val tGa = tq("q_grouped_auc")
      val tDc = tq("q_dataset_card")
      println(f"""SCALE_R7I {"factor":$f, "grouped_auc":$tGa%.2f, "dataset_card":$tDc%.2f}""")
      }

      // round-8 continuation wave: the bigram LM (largest frames: distinct
      // (doc,wa,wb) tuples, two windows + term join), personalized
      // PageRank (5 iterative joins, graph grows linearly per copy),
      // int8 top-k through the library call with the CONSTANT query set
      // (the registered %50 query derivation would grow BOTH join sides
      // and probe a quadratic frame by construction), the dup-flow matrix
      // (rides pair staging + two source lookups), boilerplate lines (one
      // line-hash exchange), anchor stats (target rollup), the purged-fold
      // and erasure audits (broadcast scans / keys-only joins), and the
      // two per-row scans (encoding audit, audio fingerprint)
      if (groups("r8d")) {
      val tBl = tq("q_bigram_lm")
      val tPpr = tq("q_ppr")
      val tI8 = time(force(Similarity.int8TopK(
        emb, "vec_id", "embedding", queries, "qid", "qvec", k = 5)))
      val tDf = tq("q_dup_flow")
      val tBp = tq("q_boilerplate_lines")
      val tAn = tq("q_anchor_stats")
      val tPf = tq("q_purged_folds")
      val tEr = tq("q_erasure_audit")
      val tEn = tq("q_encoding_audit")
      val tAf = tq("q_audio_fp")
      println(f"""SCALE_R8D {"factor":$f, "bigram_lm":$tBl%.2f, "ppr":$tPpr%.2f, "int8_topk_constq":$tI8%.2f, "dup_flow":$tDf%.2f, "boilerplate_lines":$tBp%.2f, "anchor_stats":$tAn%.2f, "purged_folds":$tPf%.2f, "erasure_audit":$tEr%.2f, "encoding_audit":$tEn%.2f, "audio_fp":$tAf%.2f}""")
      }

      // fifth round-8 wave: the bootstrap's ×100 replica explode (narrow,
      // one map-combined agg), GVI1 scene cuts (per-row decode), the
      // xor-fold fingerprints (pure map-combine), column diff (one
      // equi-join + one agg), and the lateness window (one user exchange)
      if (groups("r8e")) {
      val tBc = tq("q_bootstrap_ci")
      val tSc = tq("q_scene_cuts")
      val tTf = tq("q_table_fingerprint")
      val tDc2 = tq("q_diff_columns")
      val tLp = tq("q_lateness_profile")
      println(f"""SCALE_R8E {"factor":$f, "bootstrap_ci":$tBc%.2f, "scene_cuts":$tSc%.2f, "table_fingerprint":$tTf%.2f, "diff_columns":$tDc2%.2f, "lateness_profile":$tLp%.2f}""")
      }

      // sixth round-8 wave — the experimentation operators (each one
      // per-unit agg + a one-row rollup) and the recommendation health
      // rollup (rides the exact top-k; queries grow with the corpus here,
      // matching the registered query's own semantics)
      if (groups("r8f")) {
      val tAb = tq("q_ab_test")
      val tCu = tq("q_cuped")
      val tDid = tq("q_did")
      val tRc = tq("q_rec_coverage")
      val tTs = tq("q_threshold_sweep")
      println(f"""SCALE_R8F {"factor":$f, "ab_test":$tAb%.2f, "cuped":$tCu%.2f, "did":$tDid%.2f, "rec_coverage":$tRc%.2f, "threshold_sweep":$tTs%.2f}""")
      }

      // round-9 wave — distribution-shift / eval analytics: KS (value
      // collapse + two distributed prefix sums — cardinality-bounded, not
      // row-bounded), Gini (GlobalRank, no single-reducer sort), Benford /
      // mutual info / Cramér's V (grouped counts + tiny broadcasts),
      // CUSUM changepoint (daily rollup window — bounded by the date
      // range, not volume), stratified sampling (two tiny broadcasts over
      // one narrow gate pass), and the Bloom membership audit (one build
      // agg + two probe scans)
      if (groups("r9")) {
      val tKs = tq("q_ks_test")
      val tGi = tq("q_gini")
      val tBe = tq("q_benford")
      val tMi = tq("q_mutual_info")
      val tCp = tq("q_changepoint")
      val tCv = tq("q_cramers_v")
      val tSs = tq("q_stratified_sample")
      val tBf = tq("q_bloom_fpr")
      // IVF-PQ probes a CONSTANT query set through the library call (the
      // registered %50 derivation would grow both sides — the r8d
      // int8_topk rationale)
      val tIp = time(force(Similarity.ivfPqTopK(
        emb, "vec_id", "embedding", queries, "qid", "qvec", k = 5)))
      val tHi = tq("q_hits")
      val tW1 = tq("q_wasserstein")
      println(f"""SCALE_R9 {"factor":$f, "ks_test":$tKs%.2f, "gini":$tGi%.2f, "benford":$tBe%.2f, "mutual_info":$tMi%.2f, "changepoint":$tCp%.2f, "cramers_v":$tCv%.2f, "stratified_sample":$tSs%.2f, "bloom_fpr":$tBf%.2f, "ivfpq_topk_constq":$tIp%.2f, "hits":$tHi%.2f, "wasserstein":$tW1%.2f}""")
      }

      // round-11 wave — the co-purchase ITERATIVE family over the
      // bucketed symmetric staging (stagedCoPurchaseSym): the layout win
      // certified at scale the way hits was in r10. Per-copy partkey
      // offsets keep the scaled graphs a disjoint union of the 1x graph,
      // so round counts (star contraction, peel depth) stay constant and
      // the curves measure per-round JOIN cost, which is what the bucket
      // layout targets. The untimed q_assortativity call pays the one-off
      // staged-table build outside every timer (staging is ingest cost;
      // probes measure queries — the production posture).
      if (groups("r11")) {
      tq("q_assortativity")
      val tCo = tq("q_components")
      val tLp = tq("q_label_prop")
      val tKc = tq("q_k_core")
      val tKt = tq("q_k_truss")
      val tWc = tq("q_walk_centrality")
      val tIc = tq("q_incremental_copurchase")
      val tScc = tq("q_scc")
      val tCd = tq("q_cdc_dedup")
      val tCl = tq("q_cdc_delta")
      println(f"""SCALE_R11 {"factor":$f, "components":$tCo%.2f, "label_prop":$tLp%.2f, "k_core":$tKc%.2f, "k_truss":$tKt%.2f, "walk_centrality":$tWc%.2f, "incremental_copurchase":$tIc%.2f, "scc":$tScc%.2f, "cdc_dedup":$tCd%.2f, "cdc_delta":$tCl%.2f}""")
      }

      // round-13 wave. LAST in the loop: the cross-JVM cells below clear
      // the in-process staging set, which would add marker-probe cost to
      // any group running after them.
      // (a) The bucketed-basket AT-SCALE claim (VERDICT r12 #5):
      // q_assoc_rules is flat at sf0.1 because the pair self-join's
      // build side still broadcasts; the claim that the staged bucketed
      // layout deletes the self-join exchange was only shape-pinned.
      // With broadcast DISABLED, run the REAL rule derivation over the
      // staged bucketed basket table vs the identical frame staged as
      // plain parquet: bucketed sides join bucket-locally (no exchange,
      // no sort), plain pays the two-sided shuffle + sort.
      if (groups("r13")) {
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val bkt = graft.SparkEntry.stagedBaskets(spark, base) // staged build outside timers
      val plainPath = s"$base/baskets_plain.parquet"
      graft.ext.MarketBasket.cappedBaskets(
          spark.read.parquet(s"$base/lineitem.parquet")
            .select("l_orderkey", "l_partkey"),
          "l_orderkey", "l_partkey", maxGroupSize = 256)
        .write.mode("overwrite").parquet(plainPath)
      val plain = spark.read.parquet(plainPath)
      var tBkt = 0.0d; var tPlain = 0.0d
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tBkt = time(force(graft.ext.MarketBasket
          .associationRulesFromBaskets(bkt, minShared = 2)))
        tPlain = time(force(graft.ext.MarketBasket
          .associationRulesFromBaskets(plain, minShared = 2)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      // (b) the single-pass web extraction build (VERDICT r12 #4):
      // one multi-output pass over the raw HTML vs the three dedicated
      // product derivations it replaced — same page frame, compute-only
      // (no write), so the cells price exactly the shared-scan saving.
      val pages = spark.read.parquet(dPath).select(col("doc_id"),
        graft.ext.WebText.synthesizeHtml(col("doc_id"),
          coalesce(col("text"), lit(""))).as("html"))
      val tSep = time {
        force(graft.ext.WebText.extract(pages, "doc_id", "html"))
        force(graft.ext.WebText.links(pages, "doc_id", "html", "corp.example.com"))
        force(graft.ext.WebText.anchorPairs(pages, "doc_id", "html", "corp.example.com"))
      }
      val tOne = time(force(graft.ext.WebText.extractAll(
        pages, "doc_id", "html", "corp.example.com")))
      // (c) the REAL cross-JVM warm path (ADVICE r12): r12b's warm cells
      // measure the in-process stagedRefs fast path; a fresh JVM's first
      // touch of a warm staging instead pays the marker read + O(#files)
      // input-fingerprint walk (+ bucketed re-register/count). Cell
      // order matters: the FIRST call on this probe dir is the cold
      // staging build, the call after a resetStagingRefsForTest prices
      // the fresh-JVM warm path, and the final call (refs warm again)
      // prices the in-process fast path.
      val tBuildHtml = tq("q_html_extract")
      graft.SparkEntry.resetStagingRefsForTest()
      val tXjvmHtml = tq("q_html_extract")
      val tInprocHtml = tq("q_html_extract")
      val tBuildPj = tq("q_prefix_join")
      graft.SparkEntry.resetStagingRefsForTest()
      val tXjvmPj = tq("q_prefix_join")
      val tInprocPj = tq("q_prefix_join")
      // (d) PageRank data-motion forms at scale: the exchange form ships
      // an EDGE-sized contribution shuffle per round; the broadcast-
      // iteration form (edgesByDst = the swapped symmetric bucketed
      // table) ships only the NODE-sized (rank div outdeg) frame.
      // Board-neutral at sf0.1 (matched A/B r13) — this cell measures
      // whether the curves diverge as edges grow 20×. Bit-identical
      // ranks either way (GraphOpsSpec pins equality).
      val symE = graft.SparkEntry.stagedBipartiteEdges(spark, base)
      val tPrExch = time(force(graft.graph.GraphOps.pageRankFixedPoint(
        symE, "src", "dst", iterations = 5,
        assumeDistinct = true, assumeNoDangling = true)))
      val tPrBcast = time(force(graft.graph.GraphOps.pageRankFixedPoint(
        symE, "src", "dst", iterations = 5,
        assumeDistinct = true, assumeNoDangling = true,
        edgesByDst = Some(symE.select(col("dst").as("src"), col("src").as("dst"))))))
      println(f"""SCALE_R13 {"factor":$f, "rules_bucketed_nobc":$tBkt%.2f, "rules_plain_nobc":$tPlain%.2f, "web_three_builds":$tSep%.2f, "web_one_pass":$tOne%.2f, "html_extract_build":$tBuildHtml%.2f, "html_extract_warm_xjvm":$tXjvmHtml%.2f, "html_extract_warm_inproc":$tInprocHtml%.2f, "prefix_join_build":$tBuildPj%.2f, "prefix_join_warm_xjvm":$tXjvmPj%.2f, "prefix_join_warm_inproc":$tInprocPj%.2f, "pagerank_exchange":$tPrExch%.2f, "pagerank_bcast":$tPrBcast%.2f}""")
      }

      // round-14 wave — run alone (`ScaleProbe <dir> <factors> r14`), same
      // cold-staging assumption as r13.
      // (a) The bucket-sizing rule applied to its UNTESTED sibling (r13
      // verdict #1): stagedCoPurchaseSym is 16 buckets while the session
      // parallelism is 32 — the r13 basket A/B measured that a
      // bucket-local join capped below the session's parallelism LOSES
      // to the plain-shuffle path. Stage the IDENTICAL symmetric frame
      // at 16 and 32 buckets (probe-only names) and, under broadcast-off
      // (the 100 TB posture where node frames stop broadcasting), time
      // the two heaviest consumer shapes: the 5-round label-prop
      // recurrence (per-round join parallelism = bucket count) and the
      // triangle wedge closure (adjacency self-joins on the bucket key).
      if (groups("r14")) {
      val thr14 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val c16 = graft.SparkEntry.stagedCoPurchaseSymBuckets(spark, base, 16, "b16t")
      val c32 = graft.SparkEntry.stagedCoPurchaseSymBuckets(spark, base, 32, "b32t")
      var tLp16 = 0.0d; var tLp32 = 0.0d; var tTri16 = 0.0d; var tTri32 = 0.0d
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tLp16 = time(force(graft.graph.GraphOps.labelPropagateMin(
          c16, "a", "b", iterations = 5, assumeSymmetric = true)))
        tLp32 = time(force(graft.graph.GraphOps.labelPropagateMin(
          c32, "a", "b", iterations = 5, assumeSymmetric = true)))
        tTri16 = time(force(graft.graph.GraphOps.triangleCounts(
          c16, "a", "b", assumeSymmetric = true)))
        tTri32 = time(force(graft.graph.GraphOps.triangleCounts(
          c32, "a", "b", assumeSymmetric = true)))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr14)
        // probe-only stagings carry the live code digest and would
        // survive every sweep of this build (r14 ADVICE) — reclaim now
        Seq("b16t", "b32t").foreach(tag => graft.SparkEntry.dropProbeStaging(
          spark, graft.SparkEntry.coPurchaseStagingBaseName(base, tag)))
      }
      // (b) q_ppr form adjudication (r13 verdict "what's wrong" #1): the
      // board showed +16% after the switch to the broadcast-iteration
      // form; these matched INTERLEAVED cells (E,B,E,B — min of two each,
      // same JVM, same staged input) are the code-effect instrument the
      // board swing is not. If bcast ≥ exchange in-session, q_ppr's
      // default flips back to the exchange form (the variant's win is
      // network-bound and local-neutral by the r13 measurement).
      val symP = graft.SparkEntry.stagedBipartiteEdges(spark, base)
      val seeds14 = symP.select(col("src").as("node"))
        .where(col("node") % 100 === 1).distinct()
      def pprExch() = time(force(graft.graph.GraphOps.personalizedPageRankFixedPoint(
        symP, "src", "dst", seeds14, iterations = 5,
        assumeDistinct = true, assumeNoDangling = true)))
      def pprBcast() = time(force(graft.graph.GraphOps.personalizedPageRankFixedPoint(
        symP, "src", "dst", seeds14, iterations = 5,
        assumeDistinct = true, assumeNoDangling = true,
        edgesByDst = Some(symP.select(col("dst").as("src"), col("src").as("dst"))))))
      val pe1 = pprExch(); val pb1 = pprBcast()
      val pe2 = pprExch(); val pb2 = pprBcast()
      val tPprE = math.min(pe1, pe2); val tPprB = math.min(pb1, pb2)
      println(f"""SCALE_R14 {"factor":$f, "copurch_lp_b16_nobc":$tLp16%.2f, "copurch_lp_b32_nobc":$tLp32%.2f, "copurch_tri_b16_nobc":$tTri16%.2f, "copurch_tri_b32_nobc":$tTri32%.2f, "ppr_exchange":$tPprE%.2f, "ppr_bcast":$tPprB%.2f, "ppr_reps":"E=$pe1%.2f,$pe2%.2f B=$pb1%.2f,$pb2%.2f"}""")
      }

      // round-15 wave — run ALONE at cluster-representative factors
      // (`ScaleProbe <dir> 50,100 r15`; lineitem-only staging above):
      // the r14 (a) negative (16-bucket co-purchase beat 32 for the
      // 5-round label-prop at every factor 1-20× under broadcast-off)
      // shipped with the builder's own prediction that the calculus
      // flips "when per-task work grows". These cells re-run the
      // IDENTICAL A/B at 50-100× per-bucket volume to test the
      // prediction instead of inheriting a small-factor local[32]
      // negative into the 100 TB design doc (r14 verdict #7). Same
      // broadcast-off posture, same consumers, min-of-two reps for the
      // cheap label-prop cells; probe stagings reclaimed in finally.
      if (groups("r15")) {
      val thr15 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val p16 = graft.SparkEntry.stagedCoPurchaseSymBuckets(spark, base, 16, "b16u")
      val p32 = graft.SparkEntry.stagedCoPurchaseSymBuckets(spark, base, 32, "b32u")
      var lp16a = 0.0d; var lp16b = 0.0d; var lp32a = 0.0d; var lp32b = 0.0d
      var tri16 = 0.0d; var tri32 = 0.0d
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def lp(df: DataFrame) = time(force(graft.graph.GraphOps.labelPropagateMin(
          df, "a", "b", iterations = 5, assumeSymmetric = true)))
        // interleaved reps: 16,32,16,32 — host drift lands on both arms
        lp16a = lp(p16); lp32a = lp(p32); lp16b = lp(p16); lp32b = lp(p32)
        tri16 = time(force(graft.graph.GraphOps.triangleCounts(
          p16, "a", "b", assumeSymmetric = true)))
        tri32 = time(force(graft.graph.GraphOps.triangleCounts(
          p32, "a", "b", assumeSymmetric = true)))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr15)
        Seq("b16u", "b32u").foreach(tag => graft.SparkEntry.dropProbeStaging(
          spark, graft.SparkEntry.coPurchaseStagingBaseName(base, tag)))
      }
      println(f"""SCALE_R15 {"factor":$f, "copurch_lp_b16_nobc":${math.min(lp16a, lp16b)}%.2f, "copurch_lp_b32_nobc":${math.min(lp32a, lp32b)}%.2f, "copurch_tri_b16_nobc":$tri16%.2f, "copurch_tri_b32_nobc":$tri32%.2f, "lp_reps":"16=$lp16a%.2f,$lp16b%.2f 32=$lp32a%.2f,$lp32b%.2f"}""")
      }
    }
    spark.stop()
  }
}
