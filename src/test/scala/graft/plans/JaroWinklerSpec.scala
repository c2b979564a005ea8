package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native Jaro-Winkler expression against textbook vectors (exact
  * doubles cross-checked with DuckDB's jaro_winkler_similarity, the oracle
  * engine) and metric properties over seeded random strings. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(pairs: Seq[(String, String)]): Seq[Double] =
    pairs.toDF("a", "b")
      .select(NativeExpressions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq

  test("textbook vectors match the oracle engine bit-for-bit") {
    val cases = Seq(
      ("martha", "marhta")        -> 0.9611111111111111,
      ("dixon", "dicksonx")       -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964,
      ("abc", "abc")              -> 1.0,
      ("abc", "xyz")              -> 0.0,
      ("crate", "trace")          -> 0.7333333333333334,
      ("dwayne", "duane")         -> 0.8400000000000001,
      ("a", "")                   -> 0.0,
      // DuckDB's guard order scores two empties 0, not rapidfuzz's 1 —
      // the parity contract wins
      ("", "")                    -> 0.0)
    val got = jw(cases.map(_._1))
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((exp, act), in) => assert(exp == act, s"$in: expected $exp got $act")
    }
  }

  test("similarity is symmetric, bounded, and 1 exactly on equal non-empty strings") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(200)(
      (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val pairs = strs.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val fwd = jw(pairs)
    val bwd = jw(pairs.map(_.swap))
    val self = jw(strs.map(x => (x, x)))
    pairs.zip(fwd.zip(bwd)).foreach { case ((a, b), (x, y)) =>
      assert(x == y, s"asymmetric: '$a'/'$b'")
      assert(x >= 0.0 && x <= 1.0, s"out of range: '$a'/'$b' -> $x")
    }
    strs.zip(self).foreach { case (x, v) =>
      assert(v == (if (x.isEmpty) 0.0 else 1.0), s"self-sim of '$x' = $v")
    }
  }
}
