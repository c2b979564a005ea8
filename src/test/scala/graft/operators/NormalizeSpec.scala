package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("sanitizeStrings strips CR, LF and backslash from every string column") {
    val df = Seq(("a\r\nb\\c", 1L), ("clean", 2L)).toDF("s", "n")
    val got = Normalize.sanitizeStrings(df).as[(String, Long)].collect()
      .map(t => t._2 -> t._1).toMap
    assert(got(1L) == "abc")
    assert(got(2L) == "clean")
  }

  test("sanitizeStrings leaves non-string columns untouched") {
    val df = Seq((1L, 2.5, "x\ny")).toDF("a", "b", "c")
    val row = Normalize.sanitizeStrings(df).head()
    assert(row.getLong(0) == 1L && row.getDouble(1) == 2.5 && row.getString(2) == "xy")
  }

  test("joinStringArrays flattens array<string> columns with |") {
    val df = Seq((1L, Seq("x", "y", "z"))).toDF("id", "tags")
    val got = Normalize.joinStringArrays(df).select("tags").as[String].head()
    assert(got == "x|y|z")
  }

  test("joinStringArrays casts and flattens non-string arrays (CSV stage safety)") {
    val df = Seq((1L, Seq(10L, 20L), Seq(1.5d, 2.5d))).toDF("id", "nums", "vals")
    val row = Normalize.joinStringArrays(df).select("nums", "vals").head()
    assert(row.getString(0) == "10|20")
    assert(row.getString(1) == "1.5|2.5")
  }

  test("dedupByKeys keeps exactly one row per key (key-set compare)") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val got = Normalize.dedupByKeys(df, Seq("id"))
    assert(got.count() == 2)
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("dropNullKeys removes rows with null keys only") {
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("id", "v")
    assert(Normalize.dropNullKeys(df, Seq("id")).count() == 1)
  }

  test("withChunkIds assigns contiguous chunks of exactly chunkSize") {
    val df = spark.range(25).toDF("id")
    val counts = Normalize.withChunkIds(df, 10)
      .groupBy("chunk").count().orderBy("chunk")
      .as[(Long, Long)].collect().toSeq
    assert(counts == Seq((0L, 10L), (1L, 10L), (2L, 5L)))
  }

  test("normalize chain is idempotent") {
    val df = Seq((1L, "a\nb"), (1L, "dup"), (2L, "c")).toDF("id", "v")
    val once = Normalize.normalize(df, Seq("id"))
    val twice = Normalize.normalize(once, Seq("id"))
    assert(once.count() == twice.count())
    assert(once.count() == 2)
  }
}
