package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def ent(texts: Seq[String]): Seq[(Long, Long)] =
    texts.toDF("t")
      .select(NativeExpressions.charEntropy(col("t")).as("e"))
      .select(col("e.n_cp"), col("e.ent_unats"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("entropy quantization matches closed forms") {
    // single repeated char: p=1, -p ln p = 0
    assert(ent(Seq("aaaa")) == Seq((4L, 0L)))
    // uniform over 2 chars: 2 * floor(0.5*ln2*1e6 + .5) = 2 * 346574
    assert(ent(Seq("aabb")) == Seq((4L, 693148L)))
    // uniform over 4 chars: 4 * floor(0.25*ln4*1e6 + .5)
    val exp4 = 4L * math.floor(0.25 * math.log(4.0) * 1e6 + 0.5).toLong
    assert(ent(Seq("abcd")) == Seq((4L, exp4)))
  }

  test("code points are counted, not UTF-16 units; empty input is NULL") {
    // U+1D11E (musical G clef) is one code point, two UTF-16 chars
    assert(ent(Seq("a𝄞b")).head._1 == 3L)
    val n = Seq("").toDF("t")
      .select(NativeExpressions.charEntropy(col("t")).as("e"))
      .where(col("e").isNull).count()
    assert(n == 1L)
  }
}
