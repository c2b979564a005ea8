package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural data profiling: dependency discovery over column sets —
  * the schema-inference complement to the value-level q_column_profile
  * and the inclusion-dependency (FK) discovery of q_fk_discovery.
  */
object Profiling {

  /** Single-column FUNCTIONAL-dependency discovery (the unary case of
    * TANE/Metanome-style FD profiling): for every ordered pair
    * `A -> B` over `cols`, `A` determines `B` iff no distinct `A` value
    * maps to more than one non-null `B` value. Emits one row per
    * candidate: determinant, dependent, the determinant's distinct-value
    * count, how many determinant values VIOLATE (map to >= 2 dependent
    * values), and whether the FD holds exactly.
    *
    * Null semantics follow SQL `count(DISTINCT ...)`: null dependents are
    * ignored (a determinant value seen only with null `B` holds
    * trivially); a null DETERMINANT is one group like any other — both
    * choices replay identically in any engine, which keeps the operator
    * oracle-checkable.
    *
    * Scale shape: ONE Expand-based GROUPING SETS aggregation covers
    * EVERY determinant in a single table scan and a single exchange
    * (grouping set `(A)` per candidate determinant, every column's
    * count-distinct computed per group, `grouping_id()` naming the
    * determinant), then one tiny aggregation keyed on the grouping id
    * and a constant-size `stack` unpivot of the |cols|-row summary —
    * 2 shuffles total for |cols|·(|cols|-1) candidates, and the table
    * is read once instead of once per determinant. The per-group state
    * is one count-distinct buffer per dependent, bounded by that
    * dependent's per-determinant cardinality (exactly what the FD test
    * measures; a holding FD's buffer is a single value). */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    // 64 columns would make `1L << n` wrap (Scala shifts mod 64), turning
    // every grouping id negative and silently null-dropping all rows —
    // fail loudly at the boundary Spark's own grouping sets stop at
    require(cols.size < 64, s"at most 63 columns per pass, got ${cols.size}")
    val n = cols.size
    // grouping_id bit j is SET when cols(j) is aggregated away, leftmost
    // grouping column = highest bit — grouping set {cols(i)} therefore
    // reads (2^n - 1) - 2^(n-1-i). A null determinant VALUE is its own
    // group within its set (same semantics as groupBy), distinguished
    // from other sets by the id, never by the (null) value columns.
    def gidOf(i: Int): Long = (1L << n) - 1 - (1L << (n - 1 - i))
    val cds = cols.map(b => countDistinct(col(b)).as(s"__cd_$b"))
    val groups = df
      .groupingSets(cols.map(c => Seq(col(c))), cols.map(col): _*)
      .agg(grouping_id().as("__gid"), cds: _*)
    val viols = cols.map(b =>
      sum(when(col(s"__cd_$b") > 1, lit(1L)).otherwise(lit(0L))).as(s"__v_$b"))
    val summary = groups.groupBy(col("__gid"))
      .agg(count(lit(1)).as("__n_det"), viols: _*)
    val nameByGid = map(cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(gidOf(i)), lit(c)) }: _*)
    // the self row (dependent == determinant, count-distinct of the
    // grouping column itself) is meaningless by construction — drop it.
    // Unpivot via the Column API (explode over an array of structs), with
    // the per-column violation counts first rebound to POSITIONAL
    // synthetic names (toDF renames by position, no parsing): no user
    // column name is ever spliced into SQL text or re-resolved, so names
    // carrying quotes, spaces, hyphens or dots pass through untouched —
    // they only ever appear as `lit(...)` label values
    val safe = summary.toDF(
      "__gid" +: "__n_det" +: cols.indices.map(i => s"__v_$i"): _*)
    val pairs = array(cols.zipWithIndex.map { case (b, i) =>
      struct(lit(b).as("dependent"), col(s"__v_$i").as("n_violations")) }: _*)
    safe
      .withColumn("determinant", element_at(nameByGid, col("__gid")))
      .select(col("determinant"), col("__n_det"), explode(pairs).as("__pair"))
      .where(col("__pair.dependent") =!= col("determinant"))
      .select(col("determinant"), col("__pair.dependent").as("dependent"),
        col("__n_det").as("n_det_values"),
        col("__pair.n_violations").as("n_violations"),
        (col("__pair.n_violations") === 0).as("holds"))
  }

  /** COMPOSITE functional dependencies — the TANE lattice level the unary
    * pass cannot see: `(a, b) → c` can hold where neither `a → c` nor
    * `b → c` does. Same one-aggregation-per-determinant shape, grouped by
    * the column PAIR; all dependents of one determinant share its
    * exchange, and the count-distinct buffers are bounded by dependent
    * cardinality per group. Null semantics inherit from count-distinct
    * (an all-null dependent group is not a violation; a null determinant
    * component forms its own group via groupBy's null handling). */
  def compositeFunctionalDependencies(df: DataFrame,
      candidates: Seq[((String, String), Seq[String])]): DataFrame = {
    require(candidates.nonEmpty, "need at least one (pair -> dependents) candidate")
    candidates.map { case ((a, b), deps) =>
      require(deps.nonEmpty && !deps.contains(a) && !deps.contains(b),
        s"dependents of ($a, $b) must be non-empty and disjoint from the pair")
      val cds = deps.map(c => countDistinct(col(c)).as(s"__cd_$c"))
      val groups = df.groupBy(col(a), col(b)).agg(cds.head, cds.tail: _*)
      val viols = deps.map(c =>
        sum(when(col(s"__cd_$c") > 1, lit(1L)).otherwise(lit(0L))).as(s"__v_$c"))
      val summary = groups.agg(count(lit(1)).as("__n_det"), viols: _*)
      deps.map(c => summary.select(
        lit(s"$a,$b").as("determinant"), lit(c).as("dependent"),
        col("__n_det").as("n_det_values"),
        col(s"__v_$c").as("n_violations"),
        (col(s"__v_$c") === 0).as("holds"))).reduce(_.unionByName(_))
    }.reduce(_.unionByName(_))
  }

  /** ORDER-INDEPENDENT content fingerprint per table — the cheap equality
    * certificate a migration / replication / backfill job publishes so
    * two copies of a dataset can be compared WITHOUT sorting or shuffling
    * either side (the order-agnostic checksum idea behind e.g. HDFS
    * composite-CRC file checksums, applied at row granularity): each row
    * canonicalizes to md5 over unit-separated, null-sentinel'd column
    * values (the [[graft.ext.Dedup.contentHash]] idea with an
    * oracle-buildable sentinel), the first 15
    * hex chars become a 60-bit long, and the table fingerprint is the
    * BIT_XOR of those longs plus the row count. XOR is commutative and
    * associative, so ANY partitioning/ordering of either copy yields the
    * same value; count is carried because XOR alone cannot see a row
    * repeated an even number of times.
    *
    * `cols` must be engine-portable renderings (integers and strings —
    * floating-point and timestamp string forms differ across engines;
    * cast those to cents/micros first). Scale: one map-combined
    * aggregation per table, no shuffle beyond the single partial-merge
    * exchange, nothing driver-side. */
  def tableFingerprint(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to fingerprint")
    // \u001f separator (boundary-collision-proof), \u0001-prefixed null
    // sentinel -- NOT contentHash's \u0000: engine VARCHARs reject NUL,
    // and the oracle must build this literal
    val canon = md5(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0001null"))): _*))
    df.select(conv(substring(canon, 1, 15), 16, 10).cast("long").as("__rh"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(__rh)").as("fingerprint"))
      .select(lit(name).as("table_name"), col("n_rows"), col("fingerprint"))
  }

  /** COLUMN-LEVEL change attribution between two snapshots of a keyed
    * table: for rows present in BOTH, how many changed each column — the
    * "what actually moved" report that turns q_snapshot_diff's row-level
    * added/removed/changed into an actionable diff (a whole-row hash says
    * a row changed; this says it was `mktsegment`, 400k times, which is
    * how upstream schema bugs and bad backfills get spotted). Added /
    * removed rows are q_snapshot_diff's dimension and deliberately not
    * re-counted here.
    *
    * Comparison is null-safe (`<=>` — null→value and value→null count as
    * changes; null→null does not). One equi-join on the key, ONE
    * map-combined aggregation computing every column's change count in
    * the same pass (not one job per column), then a constant-size unpivot
    * of the single agg row. `change_rate` is one int/int IEEE division. */
  def diffColumns(prev: DataFrame, cur: DataFrame, idCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to attribute")
    val p = prev.select(col(idCol) +: cols.map(c => col(c).as(s"__p_$c")): _*)
    val c2 = cur.select(col(idCol) +: cols.map(c => col(c).as(s"__c_$c")): _*)
    val aggs = count(lit(1)).as("n_compared") +:
      cols.map(c => sum(when(!(col(s"__p_$c") <=> col(s"__c_$c")), 1L)
        .otherwise(0L)).as(s"__d_$c"))
    val one = p.join(c2, Seq(idCol)).agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c => s"'$c', __d_$c").mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stack) AS (column_name, n_changed)",
        "n_compared")
      .select(col("column_name"), col("n_changed"), col("n_compared"),
        (col("n_changed").cast("double") / col("n_compared").cast("double"))
          .as("change_rate"))
  }
}
