package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** Invariants of the deterministic hash-gate sampling family. Small row
  * counts per case — each property runs real Spark jobs. */
object SamplingProps extends Properties("Sampling") {

  private lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val fracPair: Gen[(Double, Double)] = for {
    a <- Gen.choose(0.0, 1.0)
    b <- Gen.choose(0.0, 1.0)
  } yield if (a <= b) (a, b) else (b, a)

  property("growing the fraction only ADDS rows (gates are hash prefixes)") =
    forAll(fracPair, Gen.choose(0L, 1000000L)) { case ((lo, hi), off) =>
      import spark.implicits._
      val df = spark.range(off, off + 300).toDF("id")
      val small = Sampling.hashSample(df, "id", lo).as[Long].collect().toSet
      val big = Sampling.hashSample(df, "id", hi).as[Long].collect().toSet
      small.subsetOf(big)
    }

  property("split assignment is exhaustive and disjoint for any weights") =
    forAll(Gen.choose(0.01, 0.98), Gen.choose(0L, 100000L)) { (w, off) =>
      import spark.implicits._
      val rest = 1.0 - w
      val df = spark.range(off, off + 200).toDF("id")
      val counts = Sampling.splitAssign(df, "id",
        Seq("a" -> w, "b" -> rest / 2, "c" -> rest / 2))
        .groupBy("split").count().as[(String, Long)].collect().toMap
      counts.values.sum == 200L && counts.keySet.subsetOf(Set("a", "b", "c"))
    }

  property("purged folds: exact partition, tiling bounds, embargo monotone, any inputs") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 10000000L)),
      Gen.choose(2, 6), Gen.choose(0L, 500000L)) { (tsRaw, k, embargo) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, sum => ssum}
      val ts = tsRaw.take(60)
      val df = ts.map(Tuple1(_)).toDF("us")
      val out = Sampling.purgedTimeFolds(df, col("us"), k, embargo).collect()
      val n = ts.size.toLong
      val partition = out.forall(r =>
        r.getLong(3) + r.getLong(4) + r.getLong(5) == n)
      val sorted = out.sortBy(_.getLong(0))
      val tiles = sorted.sliding(2).forall {
        case Array(a, b) => a.getLong(2) == b.getLong(1)
        case _ => true
      }
      // every row lands in exactly one fold's TEST window overall
      val testTotal = out.map(_.getLong(3)).sum == n
      // zero embargo purges nothing; larger embargo never purges less
      val zero = Sampling.purgedTimeFolds(df, col("us"), k, 0L)
        .agg(ssum(col("purged_n"))).head().getLong(0) == 0L
      val bigger = Sampling.purgedTimeFolds(df, col("us"), k, embargo + 1000L)
        .agg(ssum(col("purged_n"))).head().getLong(0) >=
        out.map(_.getLong(5)).sum
      partition && tiles && testTotal && zero && bigger
    }

  property("shuffle order is a permutation and independent of input order") =
    forAll(Gen.choose(0L, 100000L)) { off =>
      import spark.implicits._
      val df = spark.range(off, off + 100).toDF("id")
      val pos = Sampling.shuffleOrder(df, "id").select("position", "id")
        .as[(Long, Long)].collect().toMap
      val posRev = Sampling.shuffleOrder(df.orderBy(org.apache.spark.sql.functions.col("id").desc), "id")
        .select("position", "id").as[(Long, Long)].collect().toMap
      pos.keys.toSeq.sorted == (0L until 100L) && pos == posRev
    }

  property("balancedShards: exhaustive, deterministic, totals within one max item") =
    forAll(Gen.choose(2, 8), Gen.listOfN(60, Gen.choose(1L, 5000L))) { (n, sizes) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "bytes").repartition(5)
      val out = Sampling.balancedShards(df, "id", col("bytes"), n)
        .select("id", "shard").as[(Long, Int)].collect().toMap
      val totals = rows.groupBy(r => out(r._1)).map { case (_, rs) => rs.map(_._2).sum }
      val outRev = Sampling.balancedShards(
        df.orderBy(col("id").desc), "id", col("bytes"), n)
        .select("id", "shard").as[(Long, Int)].collect().toMap
      out.size == 60 &&                                  // every row dealt once
        out.values.forall(s => s >= 0 && s < n) &&       // into a real shard
        (totals.max - totals.min) <= sizes.max &&        // snake-draft balance bound
        out == outRev                                    // input-order independent
    }
}
