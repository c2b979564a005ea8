package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the relational/statistical inline queries
  * (q_trend_slope, q_ri_audit, q_fuzzy_match) the oracle hash-match cannot
  * express — agreement with Spark's own estimators, audit-count identities,
  * and linkage-pair soundness. */
class RelationalOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("integer-moment OLS agrees with Spark's float regr_/corr estimators") {
    val out = SparkEntry.queries("q_trend_slope")(spark, dir).cache()
    try {
      val orders = graft.sources.Tables.read(spark, dir, "orders")
      assert(out.agg(sum("n")).head.getLong(0) == orders.count())
      assert(out.where(col("pearson_r") < -1 || col("pearson_r") > 1).isEmpty)
      // Spark's regr_slope/corr accumulate doubles (order-dependent last
      // bits) — the exact integer-moment path must land within float noise
      val ref = orders.select(col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("double").as("x"),
          (floor(col("o_totalprice") * 100.0d + 0.5d)).cast("double").as("y"))
        .groupBy("o_orderpriority")
        .agg(expr("regr_slope(y, x)").as("s2"), corr(col("y"), col("x")).as("r2"))
      val joined = out.join(ref, "o_orderpriority")
        .where(abs(col("slope_cents_per_day") - col("s2")) > 1e-4 ||
               abs(col("pearson_r") - col("r2")) > 1e-6)
      assert(joined.isEmpty, "exact-moment OLS diverged from Spark's estimator")
    } finally { out.unpersist(); () }
  }

  test("referential-integrity audit counts obey the partition identity") {
    val audit = SparkEntry.queries("q_ri_audit")(spark, dir).cache()
    try {
      assert(audit.count() == 4)
      // parents with >= 1 child + childless parents = all parents
      // (checked for the relation whose child side we can count directly)
      val row = audit.where(col("relation") === "customer->orders").head
      val customer = graft.sources.Tables.read(spark, dir, "customer")
      val orders = graft.sources.Tables.read(spark, dir, "orders")
      val withKids = orders.select(col("o_custkey")).distinct()
        .join(customer, col("o_custkey") === col("c_custkey"), "left_semi").count()
      assert(row.getAs[Long]("n_parent") == customer.count())
      assert(row.getAs[Long]("n_child") == orders.count())
      assert(row.getAs[Long]("n_childless_parent") == customer.count() - withKids)
      // the synthetic star schema is referentially clean
      assert(audit.where(col("n_orphan_child") =!= 0).isEmpty)
    } finally { audit.unpersist(); () }
  }

  test("inclusion coefficients separate true FKs from the spurious candidate") {
    val inc = SparkEntry.queries("q_fk_discovery")(spark, dir).cache()
    try {
      assert(inc.count() == 6)
      // the three declared star-schema FKs must score exactly 1.0
      val fks = Seq("orders.o_custkey->customer.c_custkey",
        "lineitem.l_partkey->part.p_partkey",
        "customer.c_nationkey->nation.n_nationkey")
      assert(inc.where(col("candidate").isin(fks: _*) && col("inclusion") =!= 1.0).isEmpty)
      // the value-domain coincidence scores strictly below 1
      assert(inc.where(col("candidate") === "part.p_size->nation.n_nationkey")
        .head.getAs[Double]("inclusion") < 1.0)
      // coefficient identity: matched <= distinct, inclusion in (0, 1]
      assert(inc.where(col("n_matched") > col("n_child_distinct")).isEmpty)
    } finally { inc.unpersist(); () }
  }

  test("fuzzy-match pairs are blocked, ordered, and within distance") {
    val pairs = SparkEntry.queries("q_fuzzy_match")(spark, dir).cache()
    try {
      assert(pairs.count() > 0)
      assert(pairs.where(col("name_a") >= col("name_b")).isEmpty)
      assert(pairs.where(col("dist") > 2 || col("dist") <= 0).isEmpty)
      // every pair shares its blocking token (the noun)
      assert(pairs.where(element_at(split(col("name_a"), " "), 2) =!=
        element_at(split(col("name_b"), " "), 2)).isEmpty)
      // blocking loses nothing at distance <= 2 HERE: names are
      // 'adjective noun' and the noun tokens differ pairwise by >= 2
      // edits themselves plus a space — verified against the unblocked
      // all-pairs scan over the (tiny) dictionary
      val names = graft.sources.Tables.read(spark, dir, "part")
        .select(col("p_name")).distinct()
      val all = names.as("a").crossJoin(names.as("b"))
        .where(col("a.p_name") < col("b.p_name") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      assert(all.count() == pairs.count(),
        "blocking dropped a within-distance pair")
    } finally { pairs.unpersist(); () }
  }

  test("sorted-neighborhood candidates are a sound subset of the blocked linkage") {
    val sn = SparkEntry.queries("q_sorted_neighborhood")(spark, dir)
      .select(least(col("name_a"), col("name_b")).as("a"),
        greatest(col("name_a"), col("name_b")).as("b"), col("dist")).cache()
    val blocked = SparkEntry.queries("q_fuzzy_match")(spark, dir)
      .select(col("name_a").as("a"), col("name_b").as("b"))
    try {
      assert(sn.count() > 0)
      assert(sn.where(col("dist") > 2).isEmpty)
      // q_fuzzy_match is verified complete at dist<=2 (test above), so
      // every sorted-neighborhood pair must appear there: SN trades
      // recall for one sort, never soundness
      assert(sn.join(blocked, Seq("a", "b"), "left_anti").isEmpty,
        "sorted-neighborhood produced a pair outside the complete dist<=2 set")
    } finally { sn.unpersist(); () }
  }

  test("user sequences carry the time-ordered tail of each user's stream") {
    val events = graft.sources.Tables.read(spark, dir, "events")
    val seqs = SparkEntry.queries("q_user_sequences")(spark, dir).cache()
    try {
      assert(seqs.count() == events.select("user_id").distinct().count())
      // never more than 8 sequence elements
      assert(seqs.where(size(split(col("seq"), ">")) > 8).isEmpty)
      // the last element is each user's latest event type ((ts, event_id)
      // order — same tie-break as the query)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val last = events.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("user_id"), col("event_type"))
      val bad = seqs.select(col("user_id"),
          element_at(split(col("seq"), ">"), -1).as("tail"))
        .join(last, "user_id")
        .where(col("tail") =!= col("event_type"))
      assert(bad.isEmpty, "sequence tail != latest event")
    } finally { seqs.unpersist(); () }
  }
}
