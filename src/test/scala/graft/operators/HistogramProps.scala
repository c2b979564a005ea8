package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The histogram-pushdown equivalence q_percentile / q_winsorize /
  * q_mad_outliers lean on: `percentile`'s frequency argument must replay
  * the expanded multiset EXACTLY (same value order, same interpolation —
  * Spark's Percentile buffers a value→count map either way), and the
  * integer-cents money sum must distribute over counts. Pinned as
  * properties so a Spark upgrade changing Percentile's frequency
  * semantics fails loudly here instead of as an oracle hash mismatch. */
object HistogramProps extends Properties("HistogramPushdown") {

  private lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  // money-like doubles (2 dp) so the cents rounding path is exercised;
  // small counts keep the expanded twin cheap
  private val cell: Gen[(String, Double, Int)] = for {
    g <- Gen.oneOf("A", "N", "R")
    v <- Gen.chooseNum(-100000, 100000).map(_ / 100.0)
    c <- Gen.choose(1, 5)
  } yield (g, v, c)

  // collapse duplicate (g, v) cells the way the staged groupBy-count does
  private def histogram(cells: List[(String, Double, Int)]): Seq[(String, Double, Long)] =
    cells.groupBy(c => (c._1, c._2)).toSeq
      .map { case ((g, v), cs) => (g, v, cs.map(_._3.toLong).sum) }

  property("percentile(v, p, cnt) over the histogram == percentile over expanded rows") =
    forAll(Gen.nonEmptyListOf(cell), Gen.oneOf(0.05, 0.5, 0.9, 0.95)) { (cells, p) =>
      import spark.implicits._
      val hist = histogram(cells)
      val h = hist.toDF("g", "v", "cnt")
      val rows = hist.flatMap { case (g, v, c) => Seq.fill(c.toInt)((g, v)) }.toDF("g", "v")
      val got = h.groupBy($"g")
        .agg(expr(s"percentile(v, array(${p}D, 0.5D), cnt)").as("pc"))
        .as[(String, Seq[Double])].collect().toMap
      val exp = rows.groupBy($"g")
        .agg(expr(s"percentile(v, array(${p}D, 0.5D))").as("pc"))
        .as[(String, Seq[Double])].collect().toMap
      got == exp // exact double equality: the buffers must be the same multiset
    }

  property("sum(cents(v) * cnt) over the histogram == summed cents over expanded rows") =
    forAll(Gen.nonEmptyListOf(cell)) { cells =>
      import spark.implicits._
      def cents(c: org.apache.spark.sql.Column) =
        floor(c * lit(100.0d) + lit(0.5d)).cast("long")
      val hist = histogram(cells)
      val h = hist.toDF("g", "v", "cnt")
      val rows = hist.flatMap { case (g, v, c) => Seq.fill(c.toInt)((g, v)) }.toDF("g", "v")
      val got = h.groupBy($"g")
        .agg(sum(cents($"v") * $"cnt").as("s"), sum($"cnt").as("n"))
        .as[(String, Long, Long)].collect().toSet
      val exp = rows.groupBy($"g")
        .agg(sum(cents($"v")).as("s"), count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect().toSet
      got == exp
    }
}
