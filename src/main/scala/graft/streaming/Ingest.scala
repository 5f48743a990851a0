package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.weblog.{IcebergLikeTable, Validator, Zones}

/** Structured-Streaming ingest path (SURVEY.md §3.1): the reference's
  * `API GW → Kinesis → Firehose(+validator Lambda) → S3` hot path becomes
  * `source stream → micro-batch trigger → foreachBatch { validate; route
  * valid → raw zone / invalid → error zone; observe counters }` with one
  * checkpoint dir.
  *
  * Buffering: Firehose flushes at 128 MB or 60/300 s (S5,
  * `.example.cdk.context.json:10-12`); micro-batch time triggers subsume
  * the size trigger (documented delta, SURVEY §7.3). Delivery is
  * effectively-once into the raw zone via checkpointing + append-only
  * file sink; per-shard ordering by partition key is irrelevant to the
  * hive-partitioned sink.
  */
object Ingest {

  /** Start the validated ingest stream. `stream` must be a streaming
    * DataFrame with a `payload` string column and an `ingest_ts`
    * timestamp column (tests: MemoryStream; demos: file-drop dir — the
    * shims for the reference's S1/S2 HTTP PUT envelopes).
    */
  def start(
      stream: DataFrame,
      rawZone: String,
      errorZone: String,
      checkpoint: String,
      dialect: String = "B",
      triggerSeconds: Long = 60,
      availableNow: Boolean = false): StreamingQuery =
    stream.writeStream
      .queryName("weblog-ingest")
      // availableNow = bounded catch-up: drain everything the source has
      // (in rate-limited micro-batches), then stop — same checkpoint, so
      // a scheduled backfill run resumes exactly where the last live or
      // backfill run left off (the Kinesis 24h-replay story, S4).
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val validated = Validator.validate(batch.toDF(), "payload", dialect)
        val (ok, bad) = Validator.route(validated)
        Zones.writeRawJson(ok, rawZone)
        Zones.writeErrors(bad, errorZone)
        ()
      }
      .start()

  /** §3.4: the iceberg-variant lifecycle — validate, parse, then commit
    * each micro-batch into an Iceberg-like table with the T3 routing
    * decision (append without keys, upsert with; the reference's
    * transformer stamps `operation` per deployment,
    * `firehose_to_iceberg_transformer.py:114-115`). Last-write-wins order
    * is the struct `(_batch, _mid)` — batch-major, so a replayed or older
    * micro-batch can never outrank a newer one (a single fused long would
    * break at scale: `monotonically_increasing_id` packs the partition ID
    * into bits 33+, colliding with any left-shifted batch id once
    * partition IDs exceed the shift). `_mid` breaks intra-batch duplicate
    * keys by arrival order within a partition. Failed records go to the
    * error-zone backup (`FailedDataOnly`, `firehose_to_iceberg.py:119`).
    */
  def startIcebergIngest(
      stream: DataFrame,
      table: IcebergLikeTable,
      errorZone: String,
      checkpoint: String,
      dialect: String = "B",
      triggerSeconds: Long = 60): StreamingQuery =
    stream.writeStream
      .queryName("weblog-iceberg-ingest")
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val validated = Validator.validate(batch.toDF(), "payload", dialect)
        val (ok, bad) = Validator.route(validated)
        val parsed = Validator.parsed(ok, "payload", dialect)
          .drop("payload", "event_ts")
          .withColumn("_seq", struct(
            lit(batchId).as("batch"),
            monotonically_increasing_id().as("mid")))
        // (checkpoint, batchId) is the exactly-once replay mark: the
        // checkpoint dir is stable across restarts and unique per query,
        // so a batch replayed after a crash between the table commit and
        // the checkpoint write is skipped, not re-appended (the
        // at-least-once gap of the reference's Firehose delivery,
        // firehose.py:131-133).
        table.write(parsed, "_seq", Some((checkpoint, batchId)))
        Zones.writeErrors(bad, errorZone)
        ()
      }
      .start()

  /** Event-time hourly tumbling counts over the parsed stream with a 1h
    * watermark (SURVEY §2.5: the raw path needs no watermark — ingest-time
    * partitioning — but event-time window queries do).
    */
  def hourlyEventCounts(parsed: DataFrame, watermark: String = "1 hour"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), "1 hour"), col("event"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"), col("event"), col("cnt"))

  /** In-stream deduplication by unique keys inside the watermark window
    * (SURVEY §2.5: `dropDuplicatesWithinWatermark` — the streaming-side
    * complement of the Iceberg upsert; state is bounded by the
    * watermark, so it holds at any stream length).
    */
  def dedupWithinWatermark(parsed: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming DAU (the real-time twin of `Engagement.rollingActive`'s
    * dau column): collapse the stream to one (user, day) row via keyed
    * dedup, then count per day. The 25-hour watermark bounds dedup
    * state (≈ two days of users) while still catching every same-day
    * repeat whose arrival disorder stays under the watermark — with
    * in-order ingest (the raw-zone replay assumption all §2.5 gates
    * share) the count matches the batch COUNT DISTINCT exactly; an
    * event arriving more than the watermark late is dropped upstream
    * of the dedup, the standard streaming-lateness trade.
    * Complete-mode aggregate — day-count output is tiny.
    */
  def streamingDau(parsed: DataFrame,
      watermark: String = "25 hours"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .withColumn("day", to_date(col("event_ts")))
      .dropDuplicatesWithinWatermark(Seq("user_id", "day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))

  /** §2.5 streaming approximate engagement, part 1: per-day HLL user
    * sketches maintained in the STREAMING AGGREGATION STATE STORE — the
    * state entry per day is the DataSketches HLL buffer itself
    * (`hll_sketch_agg`'s aggregation buffer), not a user set, so state
    * is O(days × sketch_size) ≈ KBs/day regardless of user count. This
    * is the approximate twin of [[streamingDau]] (whose dedup state is
    * O(users)): at 100 TB/day the sketch path is the one that holds.
    * Complete-mode output: one (day, user_sketch) row per observed day.
    */
  def streamingEngagementSketches(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("day", to_date(col("event_ts")))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"))

  /** Bounded twin of [[streamingEngagementSketches]]: the day sketches
    * as an event-time tumbling window under a watermark, run in APPEND
    * mode — each day's HLL row is emitted exactly once, when the
    * watermark (max event time − `watermark`) passes the day end, and
    * the state store holds only the still-open days inside the
    * retention horizon (complete mode above re-emits every day each
    * batch and keeps all days in state forever; this is the production
    * posture at unbounded stream length). Downstream
    * [[rollingFromDaySketches]] consumes the emitted rows unchanged.
    */
  def streamingEngagementSketchesBounded(parsed: DataFrame,
      watermark: String = "2 days"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), "1 day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"))
      .select(to_date(col("window.start")).as("day"), col("user_sketch"))

  /** Part 2, the readout: rolling DAU/WAU/MAU estimates from the
    * emitted per-day sketches by sketch UNION (`hll_union_agg` — the
    * mergeability q_hll_union gate-proves), never re-scanning events.
    * Input is tiny (one row per day), so the trailing-window self-join
    * is O(days × monthWindow).
    */
  def rollingFromDaySketches(daySketches: DataFrame, weekWindow: Int = 7,
      monthWindow: Int = 28): DataFrame = {
    require(weekWindow >= 1 && monthWindow >= weekWindow,
      "windows must be positive and month ≥ week")
    val contrib = daySketches
      .select(col("day").as("_d"), col("user_sketch").as("_sk"))
    daySketches.select(col("day"))
      .join(contrib, datediff(col("day"), col("_d")).between(0, monthWindow - 1))
      .groupBy(col("day"))
      .agg(
        hll_sketch_estimate(hll_union_agg(
          when(col("day") === col("_d"), col("_sk")))).as("dau_est"),
        hll_sketch_estimate(hll_union_agg(
          when(datediff(col("day"), col("_d")) < weekWindow, col("_sk"))))
          .as("wau_est"),
        hll_sketch_estimate(hll_union_agg(col("_sk"))).as("mau_est"))
  }

  /** Stream-stream interval join (§2.5): purchases joined to the same
    * user's views within the trailing `window`, both sides watermarked so
    * the join state is bounded — Spark buffers only rows younger than
    * watermark + interval, per key, regardless of stream length. This is
    * the streaming twin of the batch as-of/attribution join
    * (operators/Joins.asOfBackward), with multi-match semantics: every
    * (purchase, view) pair inside the interval is emitted, in append
    * mode, exactly once.
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
      window: String = "1 hour"): DataFrame = {
    val p = purchases.select(col("user_id").as("p_user"), col("event_ts").as("p_ts"))
      .withWatermark("p_ts", window)
    val v = views.select(col("user_id").as("v_user"), col("event_ts").as("v_ts"))
      .withWatermark("v_ts", window)
    p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
          col("v_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("v_ts"))
  }

  /** §2.5 stream-STATIC enrichment join: every micro-batch of the
    * stream joins the (small, slowly-changing) static dimension — the
    * classic fact-stream + dim-table shape. The dim side is explicitly
    * broadcast, so each batch is a map-side hash join: no streaming
    * state, no watermark, and the dim is re-resolvable between batches
    * (Spark re-plans the batch side per micro-batch). `left_outer`
    * keeps facts whose key the dimension lacks (nulls for dim columns),
    * matching warehouse enrichment semantics.
    */
  def enrich(parsed: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    parsed.join(broadcast(dim), on, "left_outer")

  /** Session windows on the stream (gap-close sessionization, the
    * streaming twin of the batch Sessionize operator).
    */
  def sessionWindows(parsed: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .groupBy(session_window(col("event_ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
