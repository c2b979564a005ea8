package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Invariants of the shingle expressions under arbitrary Unicode input —
  * including astral-plane code points, where UTF-16 slicing (the bug class
  * the code-point rewrite removed) would split surrogate pairs. Evaluated
  * directly at the expression level: no Spark jobs, so cases are cheap. */
object ShingleProps extends Properties("Shingles") {

  // code points: ASCII-heavy with a real share of BMP and astral characters;
  // standalone surrogates are not valid scalar values and are excluded
  private val codePoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.choose(0xa0, 0x2fff),
    2 -> Gen.choose(0x10000, 0x10fff))

  private val uniString: Gen[String] =
    Gen.listOf(codePoint).map(_.flatMap(Character.toChars(_).toSeq).mkString)

  private def evalChar(s: String, n: Int): Seq[String] = {
    val arr = CharShingles(Literal.create(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType), n).eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  property("char shingles slide by code point: distinct n-cp windows, in order") =
    forAll(uniString, Gen.choose(1, 8)) { (s0, n) =>
      val s = s0.toLowerCase(java.util.Locale.ROOT)
      val got = evalChar(s0, n)
      val cp = cps(s)
      val expected =
        if (cp.length == 0) Seq.empty
        else if (cp.length <= n) Seq(s)
        else cp.sliding(n).map(w => new String(w, 0, w.length)).toSeq.distinct
      got == expected
    }

  property("no shingle ever splits a surrogate pair") =
    forAll(uniString, Gen.choose(1, 8)) { (s0, n) =>
      evalChar(s0, n).forall { sh =>
        sh.nonEmpty &&
          !Character.isLowSurrogate(sh.head) && !Character.isHighSurrogate(sh.last)
      }
    }

  property("every multi-window shingle has exactly n code points") =
    forAll(uniString, Gen.choose(1, 8)) { (s0, n) =>
      val cp = cps(s0.toLowerCase(java.util.Locale.ROOT))
      cp.length <= n || evalChar(s0, n).forall(sh => cps(sh).length == n)
    }

  private def evalWord(s: String, n: Int): Seq[String] = {
    val arr = WordShingles(Literal.create(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType), n).eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("word shingles: every shingle joins min(n, tokenCount) whitespace-free tokens") =
    forAll(uniString, Gen.choose(1, 4)) { (s0, n) =>
      val tokens = s0.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val got = evalWord(s0, n)
      if (tokens.isEmpty) got.isEmpty
      else got.nonEmpty && got.forall { sh =>
        val parts = sh.split(" ", -1)
        parts.length == math.min(n, tokens.length)
      }
    }

  // ---- ArrayJaccard: the fused one-pass jaccard vs the set model ----

  private def jaccardModel[A](a: Seq[A], b: Seq[A]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val union = (sa ++ sb).size
    if (union == 0) 1.0 else sa.intersect(sb).size.toDouble / union
  }

  private def evalJaccardLong(a: Seq[Long], b: Seq[Long]): Any = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    ArrayJaccard(
      Literal.create(ArrayData.toArrayData(a.toArray), ArrayType(LongType, false)),
      Literal.create(ArrayData.toArrayData(b.toArray), ArrayType(LongType, false))
    ).eval(null)
  }

  private def evalJaccardStr(a: Seq[String], b: Seq[String]): Any = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def lit(xs: Seq[String]) = Literal.create(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType, false))
    ArrayJaccard(lit(a), lit(b)).eval(null)
  }

  // tiny value domain forces heavy duplication and real overlap — the
  // set-semantics cases (duplicates collapse; empty/empty = 1.0) that the
  // array_union/array_intersect composition this expression replaced
  // handled implicitly
  property("ArrayJaccard(long) equals the set model under heavy duplicates") =
    forAll(Gen.listOf(Gen.choose(0L, 12L)), Gen.listOf(Gen.choose(0L, 12L))) { (a, b) =>
      evalJaccardLong(a, b) == jaccardModel(a, b)
    }

  property("ArrayJaccard(string) equals the set model, unicode included") =
    forAll(Gen.listOf(Gen.oneOf("", "a", "b", "𝛼β", "x y", "ß")),
        Gen.listOf(Gen.oneOf("", "a", "b", "𝛼β", "x y", "ß"))) { (a, b) =>
      evalJaccardStr(a, b) == jaccardModel(a, b)
    }
}
