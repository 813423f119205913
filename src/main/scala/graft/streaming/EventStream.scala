package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape. The
  * reference is strictly batch (SURVEY.md §2.9 — no watermarks/event time
  * anywhere in its tree); this module is declared superset capability:
  * the same windowed-aggregation and sessionization semantics as the batch
  * queries (q_events_daily / q_sessionize), expressed as streaming plans
  * so they run incrementally with watermark-bounded state at scale.
  */
object EventStream {

  /** Open the parquet events dir as a stream (files appear → new batches).
    * Streaming sources need an explicit schema, so we peek the dir's footer
    * schema with a batch read and normalize `ts` the same way
    * graft.Tables.events does: BIGINT epoch-nanos (nanosAsLong legacy path)
    * via exact integer division, TIMESTAMP_NTZ via a session-zone cast
    * (sessions run UTC), native TIMESTAMP as-is. One driver-side footer read
    * per stream start — not per batch.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stored = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(stored)
    val raw = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader)
      .parquet(dir)
    stored("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }

  /** Tumbling 1-day windowed rollup with a 1-hour watermark — the
    * streaming form of the batch q_events_daily.
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("value_cents"))

  /** Cohort retention: users grouped by their FIRST-seen epoch day (the
    * cohort), then counted per (cohort, day offset) — the standard
    * retention triangle behind every product-analytics dashboard. Day
    * arithmetic is integer epoch-days (`unix_micros div 86.4e9`, UTC) so
    * any engine re-derives it exactly — no date-string parsing, no
    * timezone drift.
    *
    * Output: `(cohort_day, offset_days, n_users, n_events)` — distinct
    * users and event volume of cohort `c` active `offset` days after
    * first touch.
    *
    * Scale posture: first-touch is a partial-aggregated min per user_id
    * (one shuffle on the user key); the join back to events is an
    * equi-join on the same key, co-partitioned with that aggregate's
    * output; the final (cohort, offset) aggregate uses two-phase distinct
    * counting. Never a window over the full event stream.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val withDay = events.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("__day"))
    val firstTouch = withDay.groupBy(col("user_id"))
      .agg(min(col("__day")).as("cohort_day"))
    withDay.join(firstTouch, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("__day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  private def firstTouchPath(dir: String) = s"$dir/first_touch"
  private def activityPath(dir: String) = s"$dir/activity"
  private def metaPath(dir: String) = s"$dir/meta"

  def readFirstTouch(spark: SparkSession, stateDir: String): DataFrame =
    StateTables.readIfExists(spark, firstTouchPath(stateDir)).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Int)].toDF("user_id", "cohort_day", "bucket")
    }

  /** Streaming twin of [[cohortRetention]] — the incremental
    * materialized-view pattern of `TermStatsStream`: `foreachBatch`
    * maintains (1) a `first_touch` table, (user_id, cohort_day) hash-
    * bucketed by user with DYNAMIC partition overwrite — only buckets a
    * batch touches rewrite, and a replayed batch re-merges to the same
    * min; (2) an `activity` table of per-batch (user, day, n_events)
    * facts in (bucket, batch) partitions — replay rewrites its own
    * partitions, never double-appends; (3) a batch-id stamp making the
    * whole update idempotent under foreachBatch's at-least-once contract.
    * [[readRetention]] reconstitutes exactly the batch
    * [[cohortRetention]] frame from the two tables.
    *
    * Why not a stateful aggregation: first-touch state never expires (a
    * user may return months later), so watermark-bounded state is the
    * wrong tool; the persisted-table MV keeps state on disk, bucketed,
    * with O(touched buckets) rewrite per batch.
    */
  def cohortRetentionStream(events: DataFrame, stateDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val lastBatch = StateTables.readIfExists(spark, metaPath(stateDir))
          .map(_.head().getLong(0)).getOrElse(-1L)
        if (batchId > lastBatch) {
          val act = batch
            .select(col("user_id"),
              expr("unix_micros(ts) div 86400000000").as("day"))
            .groupBy(col("user_id"), col("day"))
            .agg(count(lit(1)).as("n_events"))
            .withColumn("bucket",
              pmod(col("user_id"), lit(nBuckets.toLong)).cast("int"))
            .persist()
          StateTables.selfMergeOverwrite(act.withColumn("batch", lit(batchId)),
            Seq("bucket", "batch"), activityPath(stateDir))
          val delta = act.groupBy(col("user_id"), col("bucket"))
            .agg(min(col("day")).as("cohort_day"))
          val touched = delta.select("bucket").distinct()
            .collect().map(_.getInt(0)) // O(nBuckets) driver scalars
          if (touched.nonEmpty) {
            val existing = readFirstTouch(spark, stateDir)
              .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
            StateTables.selfMergeOverwrite(
              existing.select("user_id", "cohort_day", "bucket")
                .unionByName(delta.select("user_id", "cohort_day", "bucket"))
                .groupBy("user_id", "bucket")
                .agg(min("cohort_day").as("cohort_day"))
                .select(col("user_id"), col("cohort_day"), col("bucket")),
              Seq("bucket"), firstTouchPath(stateDir))
          }
          act.unpersist()
          import spark.implicits._
          Seq(batchId).toDF("last_batch").coalesce(1)
            .write.mode("overwrite").parquet(metaPath(stateDir))
        }
        ()
      }
      .start()

  /** Reconstitute the retention triangle from the streamed tables —
    * bit-equal to the batch [[cohortRetention]] over the same events.
    */
  def readRetention(spark: SparkSession, stateDir: String): DataFrame = {
    val act = StateTables.readIfExists(spark, activityPath(stateDir)).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Int, Long)]
        .toDF("user_id", "day", "n_events", "bucket", "batch")
    }
    act.join(readFirstTouch(spark, stateDir).select("user_id", "cohort_day"),
        Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("n_events")).as("n_events"))
  }

  /** Click→purchase attribution: every purchase joined to each click by
    * the same user within the trailing `window` — an event-time interval
    * self-join. Works on a batch frame as-is; [[attributionStream]] is the
    * stream-stream form. Scale posture: equi-join keyed on user_id with
    * the time range as residual — shuffles each side once by user, never
    * a cross product.
    */
  def attribution(events: DataFrame, window: String = "4 hours"): DataFrame =
    attributionImpl(events, window, watermarkDelay = None)

  /** Stream-stream form of [[attribution]]: both sides watermarked, and
    * the event-time range condition lets Spark expire join state — a click
    * is held only until the watermark passes `window` beyond it, so state
    * is O(events within the window + delay), not O(stream). The remaining
    * stream-stream join surface (inner, time-bounded) of the streaming
    * superset; stream ≡ batch asserted in StreamingSpec.
    */
  def attributionStream(events: DataFrame, window: String = "4 hours",
      delay: String = "1 hour"): DataFrame =
    attributionImpl(events, window, watermarkDelay = Some(delay))

  /** One definition for both twins — projections, cents rounding, and the
    * interval predicate can't drift between the batch and stream forms
    * (the stream≡batch test's invariant). Only the watermark differs.
    */
  private def attributionImpl(events: DataFrame, window: String,
      watermarkDelay: Option[String]): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      watermarkDelay.fold(df)(d => df.withWatermark("ts", d))
    val clicks = wm(events.filter(col("event_type") === "click"))
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = wm(events.filter(col("event_type") === "purchase"))
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"),
        round(col("value") * 100, 0).cast("long").as("value_cents"))
    purchases.join(clicks,
        col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("value_cents"))
  }

  /** Streaming exact dedup: drop rows whose key columns repeat within the
    * watermark horizon (`dropDuplicatesWithinWatermark` keeps state only
    * for the watermark window — bounded at any stream length, unlike plain
    * dropDuplicates whose state grows forever). The streaming form of the
    * batch `Dedup.exactDedupKeep` for ingest pipelines.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class Event(event_id: Long, user_id: Long, tsMicros: Long)
  case class SessionState(sessionCount: Int, lastTs: Long)
  case class SessionResult(user_id: Long, n_sessions: Int)

  /** Stateful sessionization: counts 30-min-gap sessions per user with
    * explicit keyed state (KeyValueGroupedDataset.mapGroupsWithState) —
    * the custom-state API surface.
    *
    * State lifetime: by DEFAULT state is kept forever (NoTimeout), so
    * "last update per user" is always a lifetime total. Passing
    * `stateTtl = Some(d)` opts into a ProcessingTime timeout that expires
    * keys idle longer than `d`, bounding state on an unbounded user space —
    * with the documented tradeoff that the timeout emission is the FINAL
    * count for that activity period and a returning user restarts at 1
    * (consumers needing lifetime totals under a TTL must sum the
    * period finals downstream). Per-batch events are sorted per user
    * before folding (event time within a user/batch fits memory by the
    * same contract as the batch window ops).
    */
  def sessionize(events: Dataset[Event],
      stateTtl: Option[String] = None): Dataset[SessionResult] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionResult](timeoutConf) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle key expired (TTL mode only): emit the final count for
            // this activity period and drop the state
            val st = state.getOption.getOrElse(SessionState(0, Long.MinValue))
            state.remove()
            SessionResult(user, st.sessionCount)
          } else {
            val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0, Long.MinValue))
            sorted.foreach { e =>
              val isNew = st.lastTs == Long.MinValue || e.tsMicros - st.lastTs > gapUs
              st = SessionState(st.sessionCount + (if (isNew) 1 else 0), e.tsMicros)
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            SessionResult(user, st.sessionCount)
          }
      }
  }
}
