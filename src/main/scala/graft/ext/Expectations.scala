package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the
  * Deequ/Great-Expectations-shaped gate a 100 TB ingest runs before a
  * snapshot is published: completeness, domain membership, range,
  * pattern, uniqueness and referential integrity, each reported as
  * (constraint, observed numerator/denominator, rate, passed).
  *
  * Execution shape: every ROW-LEVEL constraint compiles to one
  * conditional-count aggregate, and all of them fold into a SINGLE
  * map-combined pass over the table — adding a constraint adds a
  * column to the aggregate, not a scan. [[Unique]] rides the same
  * statement (`count(distinct …)` plans one expand), and
  * [[ForeignKey]] is the only constraint that joins: a key-only
  * broadcast-or-shuffle anti-join per FK, counting orphans. The report
  * is a handful of rows; determinism is integer counts + one IEEE
  * division each.
  */
object Expectations {

  sealed trait Expectation { def name: String }
  /** share of non-null values in `col` must be ≥ minRate. */
  final case class NotNull(col: String, minRate: Double = 1.0) extends Expectation {
    def name = s"not_null($col)"
  }
  /** share of non-null values inside [lo, hi] must be ≥ minRate. */
  final case class InRange(col: String, lo: Double, hi: Double,
      minRate: Double = 1.0) extends Expectation {
    def name = s"in_range($col)"
  }
  /** share of non-null values matching `regex` must be ≥ minRate
    * (keep the pattern in the Java/RE2 common dialect if an external
    * engine must replay the report). */
  final case class Matches(col: String, regex: String,
      minRate: Double = 1.0) extends Expectation {
    def name = s"matches($col)"
  }
  /** share of non-null values in the allowed set must be ≥ minRate. */
  final case class IsIn(col: String, allowed: Seq[String],
      minRate: Double = 1.0) extends Expectation {
    def name = s"is_in($col)"
  }
  /** `cols` must be row-unique: count(distinct cols) == count(rows). */
  final case class Unique(cols: Seq[String]) extends Expectation {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** every non-null `col` must exist in `refCol` of `ref` (orphans = 0). */
  final case class ForeignKey(col: String, ref: DataFrame,
      refCol: String) extends Expectation {
    def name = s"foreign_key($col)"
  }

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** Evaluate all expectations; returns
    * (constraint, observed_num, observed_den, rate, passed) rows in the
    * given order (`ord` carries it through any engine's sort). */
  def evaluate(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "evaluate needs at least one expectation")
    // (aggregate numerator, denominator, threshold) per one-pass constraint
    val onePass = expectations.zipWithIndex.collect {
      case (e: NotNull, i) =>
        (i, e.name, cnt(col(e.col).isNotNull), count(lit(1)), e.minRate)
      case (e: InRange, i) =>
        (i, e.name, cnt(col(e.col) >= e.lo && col(e.col) <= e.hi),
          cnt(col(e.col).isNotNull), e.minRate)
      case (e: Matches, i) =>
        (i, e.name, cnt(col(e.col).rlike(e.regex)),
          cnt(col(e.col).isNotNull), e.minRate)
      case (e: IsIn, i) =>
        (i, e.name, cnt(col(e.col).isin(e.allowed: _*)),
          cnt(col(e.col).isNotNull), e.minRate)
      case (e: Unique, i) =>
        (i, e.name, countDistinct(e.cols.head, e.cols.tail: _*),
          count(lit(1)), 1.0)
    }
    val aggCols = onePass.flatMap { case (i, _, num, den, _) =>
      Seq(num.as(s"__n$i"), den.as(s"__d$i"))
    }
    // an FK-only expectation list has no one-pass aggregates — skip the
    // scan entirely rather than building an empty agg()
    val onePassReport = if (onePass.isEmpty) Seq.empty else {
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      // EXPLODE the single aggregate row into the report rows — a
      // union of per-row one.select(...) would repeat the aggregate
      // subtree once per constraint and the "one pass" claim would be
      // false in the physical plan (PlanSpec counts the fact scans)
      val rows = onePass.map { case (i, nm, _, _, thr) =>
        struct(lit(i.toLong).as("ord"), lit(nm).as("constraint"),
          col(s"__n$i").cast("long").as("observed_num"),
          col(s"__d$i").cast("long").as("observed_den"),
          lit(thr).as("threshold"))
      }
      Seq(one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*")))
    }
    // FK orphan counts: one key-only anti-join each; pass = zero orphans
    val fkReport = expectations.zipWithIndex.collect {
      case (e: ForeignKey, i) =>
        val orphans = df.select(col(e.col)).where(col(e.col).isNotNull)
          .join(e.ref.select(col(e.refCol).as(e.col)).distinct(),
            Seq(e.col), "left_anti")
        val tot = df.select(col(e.col)).where(col(e.col).isNotNull)
        orphans.agg(count(lit(1)).as("__o"))
          .crossJoin(tot.agg(count(lit(1)).as("__t")))
          .select(lit(i.toLong).as("ord"), lit(e.name).as("constraint"),
            (col("__t") - col("__o")).cast("long").as("observed_num"),
            col("__t").cast("long").as("observed_den"),
            lit(1.0).as("threshold"))
    }
    (onePassReport ++ fkReport)
      .reduce(_.unionByName(_))
      .withColumn("rate",
        when(col("observed_den") > 0,
          col("observed_num").cast("double") / col("observed_den").cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("passed", col("rate") >= col("threshold"))
  }
}
