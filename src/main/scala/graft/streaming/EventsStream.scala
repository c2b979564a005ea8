package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Per-user running profile maintained as custom stream state. */
final case class UserProfile(
    user_id: Long, n_events: Long, sum_value: Double, event_types: Set[String])

/** The OPEN run carried as stream state by [[EventsStream.scd2Intervals]].
  * Event times are `LocalDateTime` (encoder: TIMESTAMP_NTZ) so the typed
  * state stays in the fixture's own naive event-time domain — the batch
  * q_scd2 twin emits NTZ intervals, and `except`-equivalence needs the
  * streamed schema to match it exactly. */
final case class ScdRun(
    user_id: Long, run_id: Long, state: String,
    valid_from: java.time.LocalDateTime, n_events: Long)

/** A CLOSED interval emitted when a user's state changes. */
final case class ScdInterval(
    user_id: Long, run_id: Long, state: String,
    valid_from: java.time.LocalDateTime, valid_to: java.time.LocalDateTime,
    n_events: Long)

/** Structured-Streaming ingestion of the `events` table — the streaming
  * capability the reference lacks entirely (SURVEY §2.9), built the
  * Spark-native way: file source → watermark → windowed/sessionized
  * aggregation. The same transforms run in batch mode for the oracle.
  */
object EventsStream {

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // A streaming file source requires an explicit schema — take it from a
    // batch footer read of the SAME directory rather than hardcoding. The
    // fixture's ts resolution has changed across rounds (nanos -> micros
    // NTZ); a stale hardcoded `ts: LongType` read micros values as nanos
    // and shifted every streamed event time 1000x earlier (round-5 bug).
    // The footer read is metadata-only: no row data is scanned.
    val schema = spark.read.parquet(dir).schema
    // ts normalization shared with the batch reader (Tables.events) so the
    // type-dispatch rule lives in exactly one place; then cast to TIMESTAMP
    // (value-preserving under the pinned-UTC session): Spark's watermark
    // REQUIRES TimestampType — an NTZ event-time column is an
    // EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE analysis error. Batch readers
    // keep the fixture's NTZ; only the streaming event-time layer widens.
    graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(dir))
      .withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Tumbling-window counts/sums per event type; late data bounded by the
    * watermark so state stays finite at any volume. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user with a 30-minute inactivity gap —
    * `session_window` keeps state bounded by the watermark. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: each micro-batch joins against the
    * (broadcastable) static dimension — no streaming state at all, the
    * canonical way to attach dimension attributes to a stream. */
  def enriched(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    // frame-qualified refs: col(...) would be AMBIGUOUS_REFERENCE whenever
    // the stream and dimension share the key's column name
    events.join(broadcast(dim), events(streamKey) === dim(dimKey), "left_outer")

  /** Streaming exact dedup: drop re-deliveries of the same `event_id`
    * arriving within the watermark window — the streaming counterpart of
    * the batch exact-dedup operator, with state bounded by the watermark
    * instead of growing forever (`dropDuplicatesWithinWatermark`). */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream join with event-time bounds: each purchase pairs with
    * the same user's views from the preceding hour (the streaming form of
    * the q_range_join batch query). Both sides carry watermarks and the
    * join condition bounds the event-time distance, so each side's buffered
    * state is evictable once the watermark passes — the canonical
    * bounded-state stream-stream join. */
  def purchasesWithRecentViews(events: DataFrame): DataFrame = {
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "2 hours")
    val views = events
      .where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") < col("ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts"))
  }

  /** Sink a stream to partition-per-batch parquet via `foreachBatch` — the
    * general-purpose production sink when the target has no native
    * streaming writer. Each micro-batch overwrites ONLY its own
    * `batch_id=N` directory (dynamic partition overwrite), so a replayed
    * batch after a crash rewrites the same partition instead of
    * duplicating it: checkpoint + idempotent-per-batch write = effectively
    * exactly-once. Returns the started query (caller awaits/stops). */
  def toPartitionedParquet(
      stream: DataFrame, outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        EventsStream.writeBatchPartition(batch.toDF(), batchId, outPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The idempotent micro-batch sink recipe, shared by every foreachBatch
    * writer: dynamic overwrite of the batch's own `batch_id=` partition,
    * so checkpoint replay rewrites rather than duplicates. */
  private[streaming] def writeBatchPartition(
      df: DataFrame, batchId: Long, outPath: String): Unit = {
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outPath)
  }

  /** Incrementally-maintained per-user aggregate STATE TABLE from the
    * event stream — the streaming face of
    * [[graft.operators.Incremental.mergeStates]] (the materialized-view
    * pattern): each micro-batch aggregates to algebraic state rows
    * (count + integer-cents sum, so the merge is exact) and folds them
    * into the previous state.
    *
    * Exactly-once without a transactional store: state version N (the
    * state AFTER batch N) is written to its own `batch_id=N` partition
    * from state N-1 + batch N. A crash-replayed batch N recomputes from
    * the same inputs and dynamically overwrites the same partition —
    * idempotent, the same recipe as [[writeBatchPartition]]. Readers take
    * the max-batch_id partition. Micro-batch ids are sequential per
    * checkpoint lineage, which is what makes "previous = id - 1" sound.
    *
    * Retention: each batch adds one state version; long-running queries
    * should prune partitions older than `batch_id = current - k` (any
    * k >= 1 preserves the replay guarantee, which only ever reads
    * id - 1) — the same compaction cadence note as CorpusStream. */
  def maintainUserStats(
      stream: DataFrame, statePath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainMergeableState(stream, statePath, checkpoint,
      stateOf = _.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(floor(col("value") * lit(100.0d) + lit(0.5d)).cast("long")).as("sum_cents")),
      stateCols = Seq("user_id", "n_events", "sum_cents"),
      keys = Seq("user_id"),
      ops = Seq("n_events" -> "sum", "sum_cents" -> "sum"))

  /** Stream-maintained PER-VALUE count state — the streaming face of
    * [[graft.operators.Incremental.valueCountState]], which makes EXACT
    * holistic statistics (median, any quantile, mode) incrementally
    * maintainable over a discrete domain: raw events are seen once, each
    * batch folds value counts into the versioned state, and
    * [[latestValueQuantile]] recomputes the exact rank statistic from
    * state rows (∝ keys × domain, never history). Values are discretized
    * by `floor(value)` — the banding contract that keeps the domain (and
    * so the state) bounded. */
  def maintainValueCounts(
      stream: DataFrame, statePath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainMergeableState(stream, statePath, checkpoint,
      stateOf = df => graft.operators.Incremental.valueCountState(
        df.withColumn("value_band", floor(col("value")).cast("long")),
        Seq("event_type"), "value_band"),
      stateCols = Seq("event_type", "value_band", "cnt"),
      keys = Seq("event_type", "value_band"),
      ops = Seq("cnt" -> "sum"))

  /** Exact per-type quantile served from [[maintainValueCounts]]' latest
    * state version — percentile-over-history at state-table cost. */
  def latestValueQuantile(spark: SparkSession, statePath: String,
      q: Double): DataFrame =
    graft.operators.Incremental.quantileFromCounts(
      latestStateVersion(spark, statePath, "maintainValueCounts")
        .select("event_type", "value_band", "cnt"),
      Seq("event_type"), "value_band", q)

  /** Stream-maintained per-(type, hour) event counts — the incremental
    * input the q_anomaly monitor needs: each micro-batch's hourly counts
    * fold into the versioned state (hours at a batch boundary merge by
    * count addition), so the full hourly history is servable without
    * ever rescanning raw events. */
  def maintainHourlyCounts(
      stream: DataFrame, statePath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainMergeableState(stream, statePath, checkpoint,
      stateOf = _.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt")),
      stateCols = Seq("hour", "event_type", "cnt"),
      keys = Seq("hour", "event_type"),
      ops = Seq("cnt" -> "sum"))

  /** Rolling z² anomaly flags over the maintained hourly counts — the
    * streaming face of the batch q_anomaly query: same
    * [[graft.operators.TimeSeries.rollingAnomaly]] operator, fed from
    * state rows instead of a raw-event scan, so the monitor's cost is
    * hours × types regardless of event volume. */
  def latestHourlyAnomalies(spark: SparkSession, statePath: String,
      lookback: Int = 24, minPoints: Int = 12,
      zThreshold: Double = 2.0): DataFrame =
    graft.operators.TimeSeries.rollingAnomaly(
      latestStateVersion(spark, statePath, "maintainHourlyCounts")
        .select("event_type", "hour", "cnt"),
      Seq("event_type"), col("hour"), col("cnt"), lookback, minPoints, zThreshold)

  /** The shared versioned-partition maintenance recipe: state version N
    * (state AFTER batch N) = merge(version N−1, stateOf(batch N)), written
    * by dynamic overwrite to its own `batch_id=N` partition — idempotent
    * under crash-replay (see [[maintainUserStats]]' scaladoc for the
    * exactly-once argument; the batch-0 guard refuses a reset checkpoint
    * over surviving state, the torn-deployment case). */
  private[streaming] def maintainMergeableState(stream: DataFrame, statePath: String,
      checkpoint: String, stateOf: DataFrame => DataFrame,
      stateCols: Seq[String], keys: Seq[String],
      ops: Seq[(String, String)]): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val batchState = stateOf(batch.toDF())
        // batch 0 = a FRESH query (new checkpoint). Dynamic partition
        // overwrite below only rewrites batch_id=0 — if statePath still
        // holds higher-batch_id partitions from a previous run whose
        // checkpoint was reset, the latest-state readers (max batch_id)
        // would silently keep serving the STALE state. A reset checkpoint
        // with surviving state is a torn deployment: refuse it loudly
        // rather than guess which history the caller meant to keep.
        if (batchId == 0L) {
          val root = new org.apache.hadoop.fs.Path(statePath)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(root)) {
            val stale = fs.listStatus(root)
              .map(_.getPath.getName).filter(_.startsWith("batch_id="))
              .filter(_ != "batch_id=0")
            require(stale.isEmpty,
              s"maintainMergeableState: checkpoint restarts at batch 0 but $statePath " +
                s"already holds state partitions [${stale.sorted.mkString(", ")}] from a " +
                "previous run — delete the stale state (or keep the old checkpoint) " +
                "before bootstrapping, or the latest-state reader would keep serving it")
          }
        }
        val merged =
          if (batchId == 0L) batchState
          else {
            val prev = spark.read.parquet(statePath)
              .where(col("batch_id") === (batchId - 1L))
              .select(stateCols.map(col): _*)
            graft.operators.Incremental.mergeStates(Seq(prev, batchState), keys, ops)
          }
        merged
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Max-version state partition, with the no-state NPE guard. */
  private[streaming] def latestStateVersion(spark: SparkSession, statePath: String,
      producer: String): DataFrame = {
    val all = spark.read.parquet(statePath)
    val maxRow = all.agg(max(col("batch_id").cast("long"))).head
    require(!maxRow.isNullAt(0),
      s"latestStateVersion: $statePath contains no batch_id=N state partitions — " +
        s"run $producer (or point at its statePath, not its checkpoint)")
    all.where(col("batch_id") === maxRow.getLong(0))
  }

  /** Latest maintained state from [[maintainUserStats]]'s versioned
    * partitions (one bounded max over the partition column). */
  def latestUserStats(spark: SparkSession, statePath: String): DataFrame =
    latestStateVersion(spark, statePath, "maintainUserStats")
      .select(col("user_id"), col("n_events"),
        (col("sum_cents").cast("double") / lit(100.0d)).as("sum_value"))

  /** Streaming heavy-hitters maintenance: per micro-batch, summarize the
    * batch's items into a Misra-Gries summary
    * ([[graft.plans.MisraGriesAggregator]]) and fold it into the previous
    * state VERSION with the weighted merge aggregator — raw events are
    * seen once, ever; each batch's merge costs O(counters), and the state
    * table is at most `capacity` rows per version. Same versioned-
    * partition replay contract as [[maintainUserStats]] (overwriting
    * batch_id = N re-reads N-1, so redelivery is idempotent), same
    * batch-0 stale-state refusal. At capacity >= |distinct items| the
    * maintained estimates are EXACT (no eviction on any path) — the
    * configuration StreamingSpec pins against the batch recompute;
    * below capacity the N/(capacity+1) guarantee band composes across
    * merges (Agarwal et al., mergeable summaries). */
  def maintainHeavyHitters(
      stream: DataFrame, itemCol: String, statePath: String, checkpoint: String,
      capacity: Int = 64): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.plans.MisraGriesAggregator.{misraGries, misraGriesMerge}
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val batchState = batch.toDF()
          .agg(misraGries(capacity)(col(itemCol)).as("hh"))
          .select(explode(col("hh")).as("x"))
          .select(col("x.item").as("item"), col("x.est").as("est"))
        if (batchId == 0L) {
          val root = new org.apache.hadoop.fs.Path(statePath)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(root)) {
            val stale = fs.listStatus(root)
              .map(_.getPath.getName).filter(_.startsWith("batch_id="))
              .filter(_ != "batch_id=0")
            require(stale.isEmpty,
              s"maintainHeavyHitters: checkpoint restarts at batch 0 but $statePath " +
                s"already holds state partitions [${stale.sorted.mkString(", ")}] from a " +
                "previous run — delete the stale state (or keep the old checkpoint) " +
                "before bootstrapping")
          }
        }
        val merged =
          if (batchId == 0L) batchState
          else {
            val prev = spark.read.parquet(statePath)
              .where(col("batch_id") === (batchId - 1L))
              .select("item", "est")
            prev.unionByName(batchState)
              .agg(misraGriesMerge(capacity)(col("item"), col("est")).as("hh"))
              .select(explode(col("hh")).as("x"))
              .select(col("x.item").as("item"), col("x.est").as("est"))
          }
        merged
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Latest maintained summary from [[maintainHeavyHitters]]. */
  def latestHeavyHitters(spark: SparkSession, statePath: String): DataFrame = {
    val all = spark.read.parquet(statePath)
    val maxRow = all.agg(max(col("batch_id").cast("long"))).head
    require(!maxRow.isNullAt(0),
      s"latestHeavyHitters: $statePath contains no batch_id=N state partitions — " +
        "run maintainHeavyHitters first")
    all.where(col("batch_id") === maxRow.getLong(0)).select(col("item"), col("est"))
  }

  /** Custom keyed state via `flatMapGroupsWithState`: per-user running
    * profile (event count, value sum, distinct-type count) emitted on every
    * update. The state object is bounded per user, so cluster-wide state is
    * O(users) — with a timeout it would expire idle users; kept simple here
    * since the synthetic stream is finite. */
  def userProfiles(spark: SparkSession, events: DataFrame): Dataset[UserProfile] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_type", "value")
      // the typed conversion has non-nullable Long/Double slots: one NULL
      // row would kill the query (and poison the checkpoint — every
      // restart replays the same batch and dies); corrupt rows are dropped
      .na.drop(Seq("user_id", "value"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateUserProfile)
  }

  private[streaming] def updateUserProfile(
      userId: Long,
      rows: Iterator[(Long, String, Double)],
      state: GroupState[UserProfile]): Iterator[UserProfile] = {
    var p = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, Set.empty))
    rows.foreach { case (_, tpe, v) =>
      p = p.copy(n_events = p.n_events + 1, sum_value = p.sum_value + v,
        event_types = p.event_types + tpe)
    }
    state.update(p)
    Iterator.single(p)
  }

  /** Streaming SCD2: the incremental form of the batch q_scd2 operator.
    * Per-user state carries the OPEN run; a state-change event closes it
    * (emitting the interval downstream, append mode) and opens the next.
    * This is the change-history operator as it actually runs in
    * production — the warehouse table receives closed intervals
    * incrementally instead of a nightly full rebuild.
    *
    * Ordering contract: rows are sorted (ts, event_id) WITHIN each
    * micro-batch group (the group iterator is unordered), so streaming
    * output equals batch output when batches are event-time monotone per
    * user — true for AvailableNow over a static dir and for tailing an
    * append-ordered log; an out-of-order source needs watermark-delayed
    * emission upstream. The per-(user, batch) buffer this sort needs is
    * bounded by the trigger, not the stream. */
  def scd2Intervals(spark: SparkSession, events: DataFrame): Dataset[ScdInterval] = {
    import spark.implicits._
    events
      // explicit NTZ cast so the typed LocalDateTime slot binds no matter
      // which shape `ts` arrived in (NTZ passes through; an LTZ timestamp
      // from a future nanos fixture converts value-preserving under the
      // pinned-UTC session) — see Tables' resolution contract
      .selectExpr("user_id", "event_type", "cast(ts as timestamp_ntz) as ts", "event_id")
      .na.drop(Seq("user_id", "ts", "event_id"))
      .as[(Long, String, java.time.LocalDateTime, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(advanceScd2)
  }

  private[streaming] def advanceScd2(
      userId: Long,
      rows: Iterator[(Long, String, java.time.LocalDateTime, Long)],
      state: GroupState[ScdRun]): Iterator[ScdInterval] = {
    // sort key carries full nano precision — a seconds- or millis-only key
    // would order micro-gapped events arbitrarily (epochSecond*1e9 + nano
    // stays far inside Long range for any representable fixture date)
    val sorted = rows.toIndexedSeq.sortBy(r =>
      (r._3.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + r._3.getNano, r._4))
    var cur = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[ScdInterval]
    for ((u, tpe, ts, _) <- sorted) {
      cur match {
        case Some(r) if r.state == tpe =>
          cur = Some(r.copy(n_events = r.n_events + 1))
        case Some(r) =>
          out += ScdInterval(u, r.run_id, r.state, r.valid_from, ts, r.n_events)
          cur = Some(ScdRun(u, r.run_id + 1, tpe, ts, 1L))
        case None =>
          cur = Some(ScdRun(u, 1L, tpe, ts, 1L))
      }
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Drive a streaming query over a static directory to completion
    * (Trigger.AvailableNow + memory sink) — the local test harness. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = streamed.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
