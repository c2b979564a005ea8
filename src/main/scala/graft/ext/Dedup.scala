package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{HashFunctions => H, VectorFunctions => V, TextFunctions => T}
import graft.plans.NativeExpressions

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant is (narrow per-row signature) →
  * (one shuffle on the signature/bucket key) → (bounded verify). No
  * cross-join ever touches the full corpus; candidate generation is always
  * LSH-bucketed so the worst case is per-bucket quadratic, bounded by
  * bucket size, not corpus size.
  */
object Dedup {

  /** Content hash over `cols` (md5 of unit-separated concat — engine
    * portable;  cannot appear in sanitized text). */
  def contentHash(cols: Seq[Column]): Column =
    md5(concat_ws("", cols: _*))

  /** Exact-duplicate groups: one row per distinct content with the kept
    * (minimum) id and the duplicate count. One shuffle. */
  def exactDuplicateGroups(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    df.groupBy(contentHash(cols.map(col)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping the minimum-id row per content group —
    * deterministic, unlike dropDuplicates. */
  def exactDedup(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(contentHash(cols.map(col))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Per-doc MinHash signatures + LSH band hashes. numHashes must equal
    * bands * rowsPerBand. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // native expressions: the HOF variants in graft.functions are ~500×
    // slower here (interpreted per-element lambdas; see graft.plans)
    val sh = NativeExpressions.charShingles(col(textCol), shingleSize)
    df.select(
      col(idCol).as("id"),
      sh.as("shingles"),
      NativeExpressions.minhashSignature(sh, numHashes).as("signature"))
      .withColumn("bands", H.lshBandHashes(col("signature"), bands, rows))
  }

  /** Candidate near-duplicate pairs from LSH bucketing, verified with exact
    * shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Shuffle structure: explode bands (narrow) → self-join on band hash
    * (the one required shuffle) → distinct pairs → verify via two id-joins.
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, shingleSize, numHashes, bands)
      .cache()
    val buckets = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "bhash")))
    val a = buckets.select(col("band"), col("bhash"), col("id").as("id_a"))
    val b = buckets.select(col("band"), col("bhash"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = sigs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", H.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicates: 64-bit fingerprints, pigeonhole 16-bit band
    * bucketing, Hamming verify. Finds pairs within `maxHamming` (≤ 3 is
    * guaranteed by the 4-band pigeonhole; larger values may miss pairs). */
  def simhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = df.select(
      col(idCol).as("id"),
      NativeExpressions.simhash64(T.tokens(lower(col(textCol)))).as("fp"))
      .withColumn("bands", H.simhashBands(col("fp")))
      .cache()
    val buckets = fps.select(col("id"), col("fp"), posexplode(col("bands")).as(Seq("band", "bval")))
    val a = buckets.select(col("band"), col("bval"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = buckets.select(col("band"), col("bval"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "bval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), H.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Word n-gram Jaccard near-duplicates (MinHash-LSH candidates over word
    * shingles, exact n-gram Jaccard verify). */
  def ngramJaccardNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sh = NativeExpressions.wordShingles(col(textCol), ngram)
    val sigs = df.select(
      col(idCol).as("id"), sh.as("shingles"),
      NativeExpressions.minhashSignature(sh, numHashes).as("signature"))
      .withColumn("bands", H.lshBandHashes(col("signature"), bands, rows))
      .cache()
    val buckets = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "bhash")))
    val a = buckets.select(col("band"), col("bhash"), col("id").as("id_a"))
    val b = buckets.select(col("band"), col("bhash"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = sigs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", H.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Resolve near-duplicate PAIRS into clusters and pick one keeper per
    * cluster. Transitive closure via GraphX connected components (pair
    * chains a-b, b-c collapse into one cluster); the component id GraphX
    * returns is the minimum vertex id, which is exactly the deterministic
    * min-id keeper. Returns (id, keep_id) for every id that appears in a
    * pair. */
  def resolveDuplicateClusters(pairs: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgeRdd = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, 0).connectedComponents()
      .vertices.map { case (id, comp) => (id, comp) }
      .toDF("id", "keep_id")
  }

  /** Drop every near-duplicate except its cluster keeper: rows absent from
    * `pairs` pass through; paired rows survive iff they are the cluster's
    * min id. One broadcast-size join when the pair set is small (the usual
    * case), sort-merge otherwise. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = resolveDuplicateClusters(pairs)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .where(col("keep_id").isNull || col("keep_id") === col(idCol))
      .drop("keep_id")
  }

  /** Embedding near-duplicates: random-hyperplane LSH buckets, exact cosine
    * verify. `planesPerBand`×`bands` sign bits per vector. */
  def embeddingNearDuplicates(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, bands: Int = 4, planesPerBand: Int = 8,
      seed: Long = 42L): DataFrame = {
    val allPlanes = V.randomPlanes(bands * planesPerBand, dim, seed)
    val bandSigs = (0 until bands).map { bnd =>
      val planes = allPlanes.slice(bnd * planesPerBand, (bnd + 1) * planesPerBand)
      struct(lit(bnd).as("band"), V.hyperplaneSignature(col(vecCol), planes).as("sig"))
    }
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      array(bandSigs: _*).as("bands")).cache()
    val buckets = sigs.select(col("id"), col("vec"), explode(col("bands")).as("b"))
      .select(col("id"), col("vec"), col("b.band"), col("b.sig"))
    val a = buckets.select(col("band"), col("sig"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = buckets.select(col("band"), col("sig"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        NativeExpressions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .distinct()
      .where(col("cosine") >= threshold)
  }
}
