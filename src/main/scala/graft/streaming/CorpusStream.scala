package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ext.Dedup

/** Continuous corpus ingestion with incremental deduplication — the
  * streaming form of the "dedupe today's crawl against the 100 TB already
  * ingested" operation (`graft.ext.Dedup.crossCorpusNearDuplicatesStaged`).
  *
  * Shape: each micro-batch is (1) exact- and NEAR-deduped within itself
  * (min-id keeper; the same article crawled from two URLs in one batch is
  * LSH-caught, not just byte-equal dups), (2) anti-joined against the
  * near-duplicate pairs found by the staged-signature band join — the
  * reference corpus is never self-joined and only its (id, bands) columns
  * are scanned for candidate generation — and (3) appended to the output
  * as an idempotently-overwritten `batch_id=` partition, so a replayed
  * batch (checkpoint recovery) rewrites its own partition instead of
  * duplicating rows: effectively exactly-once. A not-yet-staged reference
  * (first deploy, nothing ingested) is treated as empty rather than a
  * query-killing read error — the bootstrap batch only self-dedups.
  *
  * The staged reference is NOT updated per batch: signature append is a
  * separate compaction concern (a per-batch parquet append would fragment
  * the staged table and race its readers); run [[Dedup.stageSignatures]]
  * over accepted output on a compaction cadence instead. Batches therefore
  * dedup against the reference as of staging time plus themselves — the
  * same contract a daily-crawl pipeline runs with.
  */
object CorpusStream {

  /** File-source stream over a directory of document parquet (streaming
    * sources require an explicit schema — pass the batch table's). */
  def readDocuments(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Start the dedup-ingest query. The default trigger
    * (Trigger.AvailableNow) drains what is currently in the source
    * directory, then stops; pass `Trigger.ProcessingTime(...)` for
    * continuous tailing in production. The staged reference is re-read
    * per batch THROUGH `stagedPath`, so a compaction that re-stages
    * signatures from accepted output (the documented cadence above) is
    * picked up by the next micro-batch without a restart. */
  def dedupIngest(
      docs: DataFrame, idCol: String, textCol: String,
      stagedPath: String, outPath: String, checkpoint: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // cached: the near-dup candidate/verify branches and the final
        // anti-join would otherwise recompute the dedup window 3x per batch
        // (the batch twin CorpusPipeline.funnel caches the same stage)
        val exact = Dedup.exactDedup(batch.toDF(), idCol, Seq(textCol)).cache()
        try {
          val withinPairs = Dedup.minhashNearDuplicates(
            exact, idCol, textCol, shingleSize, numHashes, bands, threshold)
          val withinBatch = Dedup.dropNearDuplicates(exact, idCol, withinPairs)
          val fs = new org.apache.hadoop.fs.Path(stagedPath)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val survivors =
            if (!fs.exists(new org.apache.hadoop.fs.Path(stagedPath))) withinBatch
            else {
              val dupIds = Dedup.crossCorpusNearDuplicatesStaged(
                withinBatch, idCol, textCol, stagedPath,
                shingleSize, numHashes, bands, threshold)
                .select(col("new_id").as(idCol)).distinct()
              withinBatch.join(dupIds, Seq(idCol), "left_anti")
            }
          EventsStream.writeBatchPartition(survivors, batchId, outPath)
        } finally exact.unpersist()
      }
      .trigger(trigger)
      .start()

  /** Streaming contamination gate: each micro-batch of documents is scored
    * against the STATIC benchmark gram set
    * ([[graft.ext.TextAnalysis.benchmarkOverlap]] — bench grams broadcast,
    * the stream side never shuffles on gram text) and only docs at or
    * under the flag threshold are appended, as idempotently-overwritten
    * `batch_id=` partitions (the same exactly-once contract as
    * [[dedupIngest]]). The benchmark set is static by design — eval suites
    * change by release, not by micro-batch; swap the frame and restart to
    * pick up a new suite. */
  def contaminationGate(
      docs: DataFrame, benchDf: DataFrame, idCol: String, textCol: String,
      outPath: String, checkpoint: String,
      n: Int = 3, flagAt: Double = 0.2): StreamingQuery = {
    // the eval suite is static across the query's lifetime: build + pin its
    // gram set ONCE, not per micro-batch (same recompute rationale as the
    // cached per-batch frame in dedupIngest above). Materialized EAGERLY —
    // a lazy cache would first fill inside micro-batch 1, so a benchDf over
    // mutable input could score later batches against a different gram set
    // than the one the query contract promises
    val benchGrams = graft.ext.TextAnalysis.benchGramSet(benchDf, textCol, n).cache()
    benchGrams.count(): Unit
    val query = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // cached: scored once for the gate, scanned again for the kept rows
        val b = batch.toDF().cache()
        try {
          val clean = graft.ext.TextAnalysis.benchmarkOverlapGrams(
              b, benchGrams, idCol, textCol, n, flagAt)
            .where(!col("contaminated"))
            .select(col(idCol).as("__clean_id"))
          // null-safe semi join: a NULL-id doc the batch twin keeps must
          // not vanish here (Seq-join equality never matches NULL keys)
          val kept = b.join(clean, b(idCol) <=> clean("__clean_id"), "left_semi")
          EventsStream.writeBatchPartition(kept, batchId, outPath)
        } finally b.unpersist(): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    // release the pinned gram set when THIS query ends — without it every
    // gate start leaks one cached frame for the session's lifetime (the
    // caller only gets the StreamingQuery, never the cache handle)
    val spark = benchDf.sparkSession
    val release = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          benchGrams.unpersist(): Unit
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(release)
    // AvailableNow can finish before the listener registers; the
    // termination event would then never reach it (unpersist is idempotent,
    // so racing the listener is harmless)
    if (!query.isActive) {
      benchGrams.unpersist(): Unit
      spark.streams.removeListener(release)
    }
    query
  }

  /** Stream-maintained content-defined CHUNK STORE — the versioned-state
    * form of `q_cdc_dedup`'s report and the ingestion half of a
    * dataset-versioning pipeline: each micro-batch of documents is
    * chunked ([[graft.ext.Dedup.contentDefinedChunks]], same window/mask
    * contract), reduced to (chunk md5, refcount, length) and folded into
    * the previous state version with plain sum/min merges — document
    * text is read ONCE ever; merge cost tracks the store size plus the
    * batch's chunk count, never ingestion history. Rides
    * [[EventsStream.maintainMergeableState]], so it inherits the
    * versioned-partition exactly-once replay contract and the batch-0
    * stale-state refusal. A batch's transfer bill is the set of hashes
    * NEW to the store — anti-join state version N against N−1 (both are
    * plain partitions) — and [[latestChunkStoreStats]] reports the
    * current footprint. */
  def maintainChunkStore(stream: DataFrame, statePath: String,
      checkpoint: String, window: Int = 16, mask: Int = 64): StreamingQuery =
    EventsStream.maintainMergeableState(stream, statePath, checkpoint,
      stateOf = b => Dedup.contentDefinedChunks(b, "doc_id", "text", window, mask)
        .groupBy(md5(col("chunk")).as("h"))
        .agg(count(lit(1)).as("n_refs"), min(length(col("chunk"))).as("len")),
      stateCols = Seq("h", "n_refs", "len"),
      keys = Seq("h"),
      ops = Seq("n_refs" -> "sum", "len" -> "min"))

  /** Current chunk-store footprint from the latest maintained version:
    * (distinct_chunks, distinct_chars, total_refs) — distinct_chars is
    * the delta-store bill, total_refs the logical corpus volume. */
  def latestChunkStoreStats(spark: SparkSession, statePath: String): DataFrame =
    EventsStream.latestStateVersion(spark, statePath, "maintainChunkStore")
      .agg(count(lit(1)).as("distinct_chunks"),
        sum(col("len")).as("distinct_chars"),
        sum(col("n_refs")).as("total_refs"))

  /** Stream-maintained EXACT column profile — the continuous form of
    * [[graft.operators.Profile.columnProfile]] for an always-ingesting
    * corpus: the state is the per-(column, rendered value) count table
    * (the [[graft.operators.Incremental.valueCountState]] idea applied
    * to profiling), which merges with plain count addition, so every
    * profile statistic — including EXACT distinct counts, which no
    * algebraic per-batch state can give — recomputes losslessly from
    * state ∝ |cols| × |distinct values|, never from history. Raw rows
    * are read once ever; each micro-batch folds in at merge cost
    * ∝ state size + batch distincts. For genuinely unbounded value
    * domains swap the value key for a sketch (HLL state), same
    * pipeline shape, bounded error — the q_approx_distinct trade. */
  def maintainColumnProfile(stream: DataFrame, statePath: String,
      checkpoint: String, cols: Seq[String]): StreamingQuery =
    EventsStream.maintainMergeableState(stream, statePath, checkpoint,
      stateOf = b => {
        val p = b.select(cols.map(c => col(c).cast("string").as(c)): _*)
        p.unpivot(Array.empty[org.apache.spark.sql.Column],
            cols.map(col).toArray, "col_name", "value")
          .groupBy(col("col_name"), col("value"))
          .agg(count(lit(1)).as("cnt"))
      },
      stateCols = Seq("col_name", "value", "cnt"),
      keys = Seq("col_name", "value"),
      ops = Seq("cnt" -> "sum"))

  /** Serve the profile from the latest maintained state version — row
    * and value equal to the batch [[graft.operators.Profile
    * .columnProfile]] over everything ingested (avg_len divides the
    * same exact long sums the batch Average divides). */
  def latestColumnProfile(spark: SparkSession, statePath: String): DataFrame =
    EventsStream.latestStateVersion(spark, statePath, "maintainColumnProfile")
      .groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("value").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("value").isNotNull, lit(1))).as("n_distinct"),
        (sum(when(col("value").isNotNull, length(col("value")) * col("cnt")))
          .cast("double") /
          sum(when(col("value").isNotNull, col("cnt"))).cast("double"))
          .as("avg_len"))
}
