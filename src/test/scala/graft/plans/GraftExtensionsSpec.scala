package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SQL surface of the native expressions: registered functions must be
  * callable from spark.sql and agree exactly with the DataFrame API. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val registered: Unit = GraftExtensions.register(spark)

  test("registered SQL functions match the DataFrame-API expressions") {
    registered
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val sqlBands = spark.sql(
      "SELECT minhash_bands(char_shingles(text, 5), 128, 16) AS b FROM ext_docs")
      .as[Seq[Long]].head()
    val apiBands = df.select(
      NativeExpressions.minhashBands(
        NativeExpressions.charShingles(col("text"), 5), 128, 16).as("b"))
      .as[Seq[Long]].head()
    assert(sqlBands == apiBands)
    assert(sqlBands.length == 16)

    val sqlSim = spark.sql(
      "SELECT simhash64(word_shingles(text, 1)) AS fp FROM ext_docs").as[Long].head()
    val apiSim = df.select(
      NativeExpressions.simhash64(NativeExpressions.wordShingles(col("text"), 1)).as("fp"))
      .as[Long].head()
    assert(sqlSim == apiSim)

    val cos = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").as[Double].head()
    assert(cos == 1.0)
    val eu = spark.sql(
      "SELECT euclidean_distance(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS e").as[Double].head()
    assert(eu == 5.0)

    val jw = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS j").as[Double].head()
    assert(jw == 0.9611111111111111)
    val ent = spark.sql(
      "SELECT char_entropy('aabb').n_cp AS n, char_entropy('aabb').ent_unats AS e")
      .as[(Long, Long)].head()
    assert(ent == ((4L, 693148L)))
  }

  test("sketch parameters must be integer literals") {
    registered
    val ex = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), length('xx')) AS s").collect()
    }
    assert(ex.getMessage.contains("integer literal"))
  }

  test("FuseSimHashTokenize rewrites the naive composition, preserving results") {
    registered
    import spark.implicits._
    val df = Seq((1L, "The Quick Brown fox"), (2L, ""), (3L, "  \t ")).toDF("id", "text")
    df.createOrReplaceTempView("fuse_docs")
    // the naive SQL composition of primitives
    val naive = spark.sql(
      """SELECT id, simhash64(filter(split(lower(text), '\\s+'), t -> t != '')) AS fp
        |FROM fuse_docs""".stripMargin)
    val analyzed = naive.queryExecution.analyzed
    val rewritten = FuseSimHashTokenize(analyzed)
    // the rule fires on the analyzed plan and removes the composition
    assert(rewritten.expressions.map(_.toString).mkString.contains("simhash_text"))
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[SimHash64])))
    // the fused form the rule produces is semantics-preserving, including
    // token-less rows (coalesce turns the fused NULL into the composition's
    // empty-vote fingerprint 0)
    val fused = spark.sql(
      "SELECT id, coalesce(simhash_text(text), 0L) AS fp FROM fuse_docs")
    val a = naive.orderBy("id").as[(Long, Long)].collect().toSeq
    val b = fused.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.filter(_._1 >= 2L).forall(_._2 == 0L))
    // a different split pattern must NOT be rewritten
    val other = spark.sql(
      """SELECT simhash64(filter(split(lower(text), ','), t -> t != '')) AS fp
        |FROM fuse_docs""".stripMargin)
    val untouched = FuseSimHashTokenize(other.queryExecution.analyzed)
    assert(untouched.expressions.exists(_.exists(_.isInstanceOf[SimHash64])))
  }

  test("extensions class injects the same functions into a fresh config") {
    // the class is instantiable and applies cleanly to an extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
