package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("column profile: nulls, exact distincts and mean rendered length per column") {
    val df = Seq(
      (1L, Option("aa"), Option(10)),
      (2L, Option("bbbb"), None),
      (3L, None, Option(10)),
      (4L, Option("aa"), Option(20))
    ).toDF("id", "s", "x")
    val p = Profile.columnProfile(df, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0 && p("id").getLong(3) == 4)
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2)
    assert(p("s").getDouble(4) == (2 + 4 + 2) / 3.0) // null length excluded
    assert(p("x").getLong(2) == 1 && p("x").getLong(3) == 2)
  }

  test("profile drift: planted null-rate and cardinality shifts are reported exactly") {
    val prev = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, Option("d"))).toDF("id", "v")
    // cur: one value nulled, two collapse to the same value, one row added
    val cur = Seq((1L, Option("a")), (2L, None), (3L, Option("a")),
      (4L, Option("d")), (5L, Option("d"))).toDF("id", "v")
    val d = Profile.profileDrift(prev, cur, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = d("v")
    assert(v.getAs[Long]("prev_rows") == 4 && v.getAs[Long]("cur_rows") == 5)
    assert(v.getAs[Long]("prev_nulls") == 0 && v.getAs[Long]("cur_nulls") == 1)
    assert(v.getAs[Double]("null_rate_delta") == 1.0 / 5.0)
    assert(v.getAs[Long]("prev_distinct") == 4 && v.getAs[Long]("cur_distinct") == 2)
    assert(v.getAs[Long]("distinct_delta") == -2L)
    val id = d("id")
    assert(id.getAs[Double]("null_rate_delta") == 0.0)
    assert(id.getAs[Long]("distinct_delta") == 1L)
  }
}
