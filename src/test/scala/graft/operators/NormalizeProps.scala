package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** Property tests (SURVEY §5 test plan #3): invariants of the
  * normalization chain over generated inputs. Small row counts per case —
  * each property runs real Spark jobs. */
object NormalizeProps extends Properties("Normalize") {

  private lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val rowGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 5L), Gen.asciiPrintableStr.map(_.take(12) + "\r\n\\x")))

  property("sanitize removes every CR, LF and backslash") = forAll(rowGen) { rows =>
    import spark.implicits._
    rows.isEmpty || {
      val df = rows.toDF("id", "s")
      Normalize.sanitizeStrings(df).select("s").as[String].collect()
        .forall(s => !s.exists(c => c == '\r' || c == '\n' || c == '\\'))
    }
  }

  property("dedup on key is idempotent and keeps exactly the distinct key set") = forAll(rowGen) { rows =>
    import spark.implicits._
    rows.isEmpty || {
      val df = rows.toDF("id", "s")
      val once = Normalize.dedupByKeys(df, Seq("id"))
      val keys = once.select("id").as[Long].collect().toSet
      keys == rows.map(_._1).toSet &&
        Normalize.dedupByKeys(once, Seq("id")).count() == keys.size
    }
  }

  property("chunk ids partition rows into full chunks plus one remainder") =
    forAll(Gen.choose(1L, 40L), Gen.choose(1L, 7L)) { (n, chunkSize) =>
      import spark.implicits._
      val counts = Normalize.withChunkIds(spark.range(n).toDF("id"), chunkSize)
        .groupBy("chunk").count().orderBy("chunk")
        .as[(Long, Long)].collect().toSeq
      val expectFull = n / chunkSize
      val remainder = n % chunkSize
      val expected = (0L until expectFull).map(i => (i, chunkSize)) ++
        (if (remainder > 0) Seq((expectFull, remainder)) else Nil)
      counts == expected
    }
}
