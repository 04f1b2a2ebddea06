package graft.streaming

import graft.Canon
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming pipelines over the `events` stream (SURVEY.md
  * §2.2 streaming row, §7.1 step 7): watermarked tumbling / sliding /
  * session windows. Each is the streaming twin of a batch query
  * (q22/q23/q24) — identical window semantics (epoch-aligned grids,
  * 30-min session gap), so replaying the same rows through
  * `readStream` produces the same aggregates the batch query returns
  * (asserted in StreamingSpec).
  *
  * These operate on any streaming (or batch) DataFrame with the events
  * schema; the source is the caller's choice — `readStream.format(
  * "parquet"/"kafka"/"rate")` or MemoryStream in tests. Sinks likewise
  * (`writeStream` + `foreachBatch` for idempotent parquet appends).
  */
object EventPipelines {
  import Canon._

  /** The one sort key every order-sensitive fold twin uses: WALL-CLOCK
    * micros, computed in the plan before the typed fold (timestamp_ntz
    * diff from the NTZ epoch). The batch forms order by TIMESTAMP_NTZ,
    * so an Instant-based sort would make stream/batch parity
    * conditional on a UTC session — a DST fold in a non-UTC session
    * maps adjacent wall-clock values to non-monotone instants. Full
    * precision (micros, never getTime millis, which would diverge on
    * sub-millisecond data). ONE definition so the discipline cannot
    * drift per-pipeline. */
  private def ntzMicros: org.apache.spark.sql.Column =
    expr("timestampdiff(MICROSECOND, " +
      "TIMESTAMP_NTZ '1970-01-01 00:00:00', " +
      "CAST(ts AS TIMESTAMP_NTZ))")

  /** q22 twin: 1-hour tumbling event-time windows per event type. */
  def tumbling(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        d(sum(dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** q23 twin: 1-hour windows sliding every 15 minutes. */
  def sliding(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        d(sum(dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))

  /** q24 twin: per-user sessions with a 30-minute inactivity gap,
    * using the native session_window operator. */
  def sessions(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))

  /** Watermarked stream-stream join: per user, pair each `purchase`
    * event with the most recent qualifying `click` (here: any click in
    * the preceding hour). Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire state —
    * the only stream-stream join shape that runs bounded at 100 TB/day
    * (an unbounded-time join would buffer both streams forever). Works
    * identically on batch frames (tested for parity). */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    attributed(clicks, purchases, watermark, "inner")

  /** Left-outer variant: EVERY purchase emits — joined to qualifying
    * clicks when they exist, with null click columns once the
    * watermark proves no qualifying click can still arrive (the
    * condition bounds click_ts ≤ purchase_ts, so a purchase row is
    * complete as soon as the click watermark passes its timestamp).
    * This is the attribution-report shape: unattributed conversions
    * must appear, not silently drop, and state stays bounded by the
    * same watermark + time-range condition as the inner join. */
  def clickToPurchaseLeftOuter(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    attributed(clicks, purchases, watermark, "left_outer")

  /** q68 twin, streaming-native: consecutive-event PAIRING per user via
    * `flatMapGroupsWithState` — the sequence operator windows/joins
    * can't express (lead() needs a finished partition; a stream never
    * finishes). Each batch's rows for a user are processed in
    * (ts, event_id) order and the last seen event is CARRIED IN STATE,
    * so a pair spans batch boundaries exactly like the batch lead()
    * spans partition rows. Emits one (cur, nxt) row per transition
    * (Append mode — downstream counting is the consumer's aggregation,
    * e.g. foreachBatchRunningAgg, keeping this operator composable).
    *
    * Contract: batches must arrive per-user event-time monotone (the
    * ingestion-order contract every sequence-stateful operator has;
    * a late event would pair against the wrong predecessor — bound it
    * with a watermark upstream if the source can reorder). State is
    * O(1) per user: (ntz micros, event_id, event_type). Parity with
    * batch q68 across a batch split is pinned in StreamingSpec. */
  def transitionPairs(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"),
        ntzMicros.as("m"), // the [[ntzMicros]] sort-key discipline
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          // The toSeq materializes ONE user's batch slice (bounded by
          // the trigger interval), not the stream.
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          val out = Seq.newBuilder[(String, String)]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l => out += ((l._3, e._4)))
            last = Some((e._2, e._3, e._4)) // (ntz micros, id, type)
          }
          last.foreach(state.update)
          out.result().iterator
      }
      .toDF("cur", "nxt")
  }

  /** q72 twin, streaming-native: SCD2 (type-2 history) interval
    * maintenance via `flatMapGroupsWithState`. Each user's CURRENT
    * interval (tracked state + valid_from) is carried in operator
    * state; when an arriving event changes the tracked state the old
    * interval CLOSES (valid_to = new event's ts) and is emitted —
    * Append mode, so the output is the immutable closed-interval
    * history a dimension table's writer upserts from, and the one
    * open interval per user lives in state until its closing event
    * arrives. Exactly the q72 batch derivation with is_current=0 rows
    * streamed as they become final (pinned in StreamingSpec).
    *
    * Same ingestion-order contract as [[transitionPairs]]: batches
    * per-user event-time monotone; state is O(1) per user (state
    * string + full-precision valid_from). */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        // [[ntzMicros]] is the SORT key; the Timestamp column itself
        // is kept only as the emitted valid_from/valid_to VALUE
        ntzMicros.as("m"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Int),
        (Long, String, java.sql.Timestamp, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val sorted = it.toSeq.sortBy(e => (e._3, e._4))
          def ts(sec: Long, nanos: Int): java.sql.Timestamp = {
            val t = new java.sql.Timestamp(sec * 1000L)
            t.setNanos(nanos)
            t
          }
          val out = Seq.newBuilder[
            (Long, String, java.sql.Timestamp, java.sql.Timestamp)]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some((st, sec, nanos)) if st != e._5 =>
                out += ((uid, st, ts(sec, nanos), e._2))
                cur = Some((e._5,
                  e._2.toInstant.getEpochSecond, e._2.getNanos))
              case None =>
                cur = Some((e._5,
                  e._2.toInstant.getEpochSecond, e._2.getNanos))
              case _ => () // same state: interval continues
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
      .toDF("user_id", "state", "valid_from", "valid_to")
  }

  /** q97 twin, streaming-native: per-user EWMA with the accumulator
    * CARRIED IN STATE — the recursive smoothing no stream window
    * expresses. Each batch's rows for a user run the SAME left fold
    * the batch query runs (acc' = 0.2·x + 0.8·acc over (ts, event_id)
    * order, seeded with the first value); because the fold is
    * sequential, continuing it from state over a prefix split at ANY
    * boundary is bit-identical to folding the whole prefix — the
    * parity pinned in StreamingSpec. Emits one (user_id, n_readings,
    * ewma) row per user per batch (Update-mode semantics: the current
    * smoothed value, what a metrics dashboard reads). Same
    * ingestion-order contract as [[transitionPairs]]; state is O(1)
    * per user (n, acc). */
  def ewma(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"),
        // the [[ntzMicros]] sort-key discipline (q97's recurrence is
        // order-sensitive)
        ntzMicros.as("m"),
        col("event_id").cast("long"), col("value").cast("double"))
      .filter(col("value").isNotNull)
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          var (n, acc) = state.getOption.getOrElse((0L, 0.0))
          sorted.foreach { e =>
            acc = if (n == 0L) e._4 else 0.2 * e._4 + 0.8 * acc
            n += 1
          }
          if (n > 0L) state.update((n, acc))
          (uid, n,
            BigDecimal(acc).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("user_id", "n_readings", "ewma")
  }

  /** q102 twin: per-user Holt double exponential smoothing with the
    * (n, level, trend) PAIR-state carried across batches — the same
    * sequential-fold-continuation argument as [[ewma]] (the
    * recurrence is a left fold, so resuming it from state over any
    * prefix split is bit-identical to folding the whole prefix;
    * parity pinned in StreamingSpec). α = 0.3, β = 0.1, init
    * l₁ = x₁, b₁ = 0 — the q102_holt constants; l_t is computed once
    * per step into a local so the batch and stream step the identical
    * double tree. State is O(1) per user regardless of series
    * length — the target of q102's hot-user cap message. */
  def holt(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col("user_id").cast("long"),
        // the [[ntzMicros]] sort-key discipline
        ntzMicros.as("m"),
        col("event_id").cast("long"), col("value").cast("double"))
      .filter(col("value").isNotNull)
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double, Double),
          (Long, Long, Double, Double, Double)](
        GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          var (n, l, b) = state.getOption.getOrElse((0L, 0.0, 0.0))
          sorted.foreach { e =>
            if (n == 0L) { l = e._4; b = 0.0 }
            else {
              val lNext = 0.3 * e._4 + 0.7 * (l + b)
              b = 0.1 * (lNext - l) + 0.9 * b
              l = lNext
            }
            n += 1
          }
          if (n > 0L) state.update((n, l, b))
          def r6(v: Double) = BigDecimal(v)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (uid, n, r6(l), r6(b), r6(l + b))
      }
      .toDF("user_id", "n_readings", "level", "trend", "forecast")
  }

  /** q103 twin: per-(user, type) debounce with (n, last-kept-micros,
    * kept) carried in state — suppression relative to the last
    * SURVIVOR resumes across any batch split because the fold's state
    * is exactly the survivor frontier (StreamingSpec parity pin).
    * Integer micros arithmetic throughout; strict-> 30-min gap, the
    * q103 constant. O(1) state per key — the target of q103's hot-key
    * cap message.
    *
    * Micros are WALL-CLOCK (timestamp_ntz diff, computed in the plan
    * before the typed fold) — the same representation the batch form
    * diffs. An Instant-based recipe would make parity conditional on
    * a UTC session: gaps compare against a threshold here, so a DST
    * jump between two events would shift an instant-difference by an
    * hour while the ntz difference (what q103 measures) doesn't. */
  def debounce(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val gap = 1800000000L
    events
      .select(col("user_id").cast("long"),
        col("event_type").cast("string"),
        ntzMicros.as("m"),
        col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(e => (e._1, e._2))
      .mapGroupsWithState[(Long, Long, Long),
          (Long, String, Long, Long)](GroupStateTimeout.NoTimeout) {
        case ((uid, etype), it, state) =>
          val sorted = it.toSeq.sortBy(e => (e._3, e._4))
          var (n, last, kept) = state.getOption.getOrElse((0L, 0L, 0L))
          sorted.foreach { e =>
            if (n == 0L) { last = e._3; kept = 1L }
            else if (e._3 - last > gap) { last = e._3; kept += 1L }
            n += 1
          }
          if (n > 0L) state.update((n, last, kept))
          (uid, etype, n, kept)
      }
      .toDF("user_id", "event_type", "n_events", "n_kept")
  }

  private def attributed(clicks: DataFrame, purchases: DataFrame,
      watermark: String, joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("click_ts"), col("value"))
  }
}
