package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewProfile reports the hot key and a salt that averages it out") {
    // key 1: 8 rows, keys 2..5: 2 rows each -> 16 rows, 5 keys, mean 3.2
    val rows = Seq.fill(8)(1) ++ (2 to 5).flatMap(k => Seq(k, k))
    val df = rows.toDF("k")
    val r = Skew.keySkewProfile(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 16L)
    assert(r.getAs[Long]("n_keys") == 5L)
    assert(r.getAs[Long]("max_cnt") == 8L)
    assert(r.getAs[Double]("top1_share") == 0.5)
    assert(r.getAs[Double]("p50_cnt") == 2.0)
    // ceil(8 / 3.2) = ceil(2.5) = 3 via (8*5 + 16 - 1) div 16 = 55 div 16
    assert(r.getAs[Long]("suggested_salt") == 3L)
  }

  test("keySkewProfile on a uniform distribution suggests no split") {
    val df = (1 to 40).map(i => i % 10).toDF("k")
    val r = Skew.keySkewProfile(df, "k").collect().head
    assert(r.getAs[Long]("max_cnt") == 4L)
    assert(r.getAs[Long]("suggested_salt") == 1L)
  }
}
