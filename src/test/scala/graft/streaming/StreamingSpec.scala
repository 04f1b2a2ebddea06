package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.queries.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch twin parity (SURVEY.md §5 point 4, §7.4 risk 5):
  * replaying the fixture `events` rows through MemoryStream must
  * reproduce the batch q22/q23/q24 aggregates, and the stateful flow
  * tracker must implement the intended barrier semantics (the
  * reference's O14/O15, minus its vacuous-check bug — SURVEY §2.1).
  */
class StreamingSpec extends SparkSpec {
  import StreamingSpec.Ev

  private lazy val fixtureRows: Seq[Ev] = {
    val df = Events.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    df.collect().toSeq.map(r => Ev(r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
  }

  private def runStream(build: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixtureRows)
    val out = build(mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"q_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Complete()).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(qName).collect()
  }

  test("streaming tumbling windows equal the batch q22 aggregates") {
    val streamed = runStream(EventPipelines.tumbling(_))
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = graft.SparkEntry.queries("q22_tumbling_window")(
      spark, "/root/testdata/sf0.001")
      .withColumn("window_start", col("window_start").cast("timestamp"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sliding windows equal the batch q23 aggregates") {
    val streamed = runStream(EventPipelines.sliding(_))
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = graft.SparkEntry.queries("q23_sliding_window")(
      spark, "/root/testdata/sf0.001")
      .withColumn("window_start", col("window_start").cast("timestamp"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows equal the batch q24 sessionization") {
    val streamed = runStream(EventPipelines.sessions(_))
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime)).toSet
    val batch = graft.SparkEntry.queries("q24_sessionization")(
      spark, "/root/testdata/sf0.001")
      .withColumn("session_start", col("session_start").cast("timestamp"))
      .withColumn("session_end", col("session_end").cast("timestamp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3).getTime,
        r.getTimestamp(4).getTime)).toSet
    // batch rows: (user_id, session_id, n_events, start, end) — compare
    // the session (user, n_events, start, end) sets
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("watermarked stream-stream join equals the batch join of the " +
    "same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = fixtureRows.filter(_.event_type == "click")
    val purchases = fixtureRows.filter(_.event_type == "purchase")
    assert(clicks.nonEmpty && purchases.nonEmpty)
    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    memC.addData(clicks)
    memP.addData(purchases)
    val out = EventPipelines.clickToPurchase(memC.toDF(), memP.toDF())
    val qName = s"ssj_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      q.processAllAvailable()
      spark.table(qName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally q.stop()
    val batch = EventPipelines.clickToPurchase(
      clicks.toDF(), purchases.toDF()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("left-outer stream-stream join emits unattributed purchases " +
    "with null click columns after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(hours: Double) = new Timestamp(
      t0.getTime + (hours * 3600 * 1000).toLong)
    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val out = EventPipelines.clickToPurchaseLeftOuter(
      memC.toDF(), memP.toDF(), watermark = "1 hour")
    val qName = s"ssjlo_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: click then purchase (attributed); user 2: purchase
      // with NO click anywhere near it (unattributed)
      memC.addData(Ev(100L, at(0), 1L, "click", 0.0, "{}"))
      memP.addData(
        Ev(200L, at(0.5), 1L, "purchase", 9.99, "{}"),
        Ev(201L, at(0.5), 2L, "purchase", 5.00, "{}"))
      q.processAllAvailable()
      // push both watermarks well past purchase_ts + join bound so the
      // unmatched row's state can close and emit
      memC.addData(Ev(101L, at(6), 9L, "click", 0.0, "{}"))
      memP.addData(Ev(202L, at(6), 9L, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      memC.addData(Ev(102L, at(12), 9L, "click", 0.0, "{}"))
      memP.addData(Ev(203L, at(12), 9L, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table(qName).collect()
        .map(r => (r.getLong(1), Option(r.get(2)).map(_.toString)))
        .toMap
      assert(rows(200L).contains("100"), "attributed purchase lost its click")
      assert(rows.contains(201L), "unattributed purchase never emitted")
      assert(rows(201L).isEmpty, "unattributed purchase should carry null")
    } finally q.stop()
  }

  test("stateful per-user pairing reproduces the batch q68 transition " +
    "matrix, with pairs spanning the batch boundary via carried state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // split the fixture at the median timestamp so each user's rows
    // arrive in two event-time-monotone batches — cross-batch pairs
    // exist iff the carried state works
    val sorted = fixtureRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (batch1, batch2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val out = EventPipelines.transitionPairs(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"q_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(qName).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val batch = graft.SparkEntry.queries("q68_event_transitions")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"streamed ${streamed.size} cells vs " +
      s"batch ${batch.size}")
    assert(streamed.values.sum == fixtureRows.size -
      fixtureRows.map(_.user_id).distinct.size,
      "pair count != events - users (every event but each user's first " +
        "must produce exactly one pair)")
  }

  test("stateful per-user EWMA reproduces the batch q97 fold exactly " +
    "across a batch split (the accumulator carries the recursion)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = fixtureRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (batch1, batch2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val out = EventPipelines.ewma(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"ewma_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // latest emission per user (Update mode re-emits on new data)
    val streamed = spark.table(qName).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap // later rows overwrite earlier: toMap keeps the last
    val batch = graft.SparkEntry.queries("q97_ewma")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch,
      s"streamed EWMA diverges from the batch fold: " +
        s"${streamed.toSeq.sortBy(_._1).take(3)} vs " +
        s"${batch.toSeq.sortBy(_._1).take(3)}")
  }

  test("stateful per-user Holt smoothing reproduces the batch q102 " +
    "fold exactly across a batch split (level+trend carried in state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = fixtureRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (batch1, batch2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val out = EventPipelines.holt(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"holt_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(qName).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap // Update mode: later rows overwrite earlier
    val batch = graft.SparkEntry.queries("q102_holt")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(streamed == batch,
      s"streamed Holt diverges from the batch fold: " +
        s"${streamed.toSeq.sortBy(_._1).take(3)} vs " +
        s"${batch.toSeq.sortBy(_._1).take(3)}")
  }

  test("stateful debounce reproduces the batch q103 survivor counts " +
    "across a batch split (the survivor frontier carries in state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = fixtureRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (batch1, batch2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val out = EventPipelines.debounce(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"deb_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(qName).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap // Update mode: later rows overwrite earlier
    val batch = graft.SparkEntry.queries("q103_debounce")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch,
      s"streamed debounce diverges from the batch fold: " +
        s"${streamed.toSeq.sortBy(_._1).take(3)} vs " +
        s"${batch.toSeq.sortBy(_._1).take(3)}")
  }

  test("streaming SCD2 maintenance reproduces the batch q72 closed " +
    "intervals, with intervals spanning the batch boundary via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = fixtureRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (batch1, batch2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val out = EventPipelines.scd2Intervals(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")))
    val qName = s"scd2_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(qName).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
    // the batch q72 rows with a closing edge (is_current = 0) are
    // exactly the intervals the stream must have emitted
    val batch = graft.SparkEntry.queries("q72_scd2")(
      spark, "/root/testdata/sf0.001").collect()
      .filter(_.getLong(4) == 0L)
      .map { r =>
        def ms(o: Any) = o match {
          case t: java.sql.Timestamp => t.getTime
          case t: java.time.LocalDateTime =>
            t.atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        }
        (r.getLong(0), r.getString(1), ms(r.get(2)), ms(r.get(3)))
      }.toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} closed intervals vs batch ${batch.size}")
    // every user's one OPEN interval stays in state: closed count =
    // q72 rows - distinct users
    assert(streamed.size == graft.SparkEntry.queries("q72_scd2")(
      spark, "/root/testdata/sf0.001").count() -
      fixtureRows.map(_.user_id).distinct.size)
  }

  test("flow-state tracker implements the barrier semantics (O14-O16)") {
    import spark.implicits._
    import FlowStateStream._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FlowEvent]
    val out = track(mem.toDS())
    val q = out.writeStream.format("memory").queryName("flowstate")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        FlowEvent("f1", "phase_started", "work", 0, 1),
        FlowEvent("f1", "tasks_enumerated", "work", 5, 2))
      q.processAllAvailable()
      val afterEnum = spark.table("flowstate").collect()
        .filter(_.getString(0) == "f1").last
      assert(afterEnum.getLong(2) == 5 && afterEnum.getLong(4) == 5)
      assert(!afterEnum.getBoolean(5))

      mem.addData((1 to 4).map(i =>
        FlowEvent("f1", "task_finished", "work", 1, 10 + i)): _*)
      q.processAllAvailable()
      val partial = spark.table("flowstate").collect()
        .filter(_.getString(0) == "f1").last
      assert(partial.getLong(4) == 1 && !partial.getBoolean(5))

      mem.addData(FlowEvent("f1", "task_finished", "work", 1, 20))
      q.processAllAvailable()
      val done = spark.table("flowstate").collect()
        .filter(_.getString(0) == "f1").last
      assert(done.getLong(4) == 0 && done.getBoolean(5)) // barrier fires
      // next phase resets the accounting (counter delete, O14)
      mem.addData(FlowEvent("f1", "phase_started", "next", 0, 30))
      q.processAllAvailable()
      val reset = spark.table("flowstate").collect()
        .filter(_.getString(0) == "f1").last
      assert(reset.getString(1) == "next" && reset.getLong(2) == 0)

      // cross-batch reorder (r5 review fix): task_finished events land
      // in an earlier micro-batch than their tasks_enumerated — the
      // barrier must still fire once totals catch up, not freeze on
      // the enumeration branch's stale snapshot
      mem.addData(
        FlowEvent("f2", "phase_started", "work", 0, 1),
        FlowEvent("f2", "task_finished", "work", 1, 10),
        FlowEvent("f2", "task_finished", "work", 1, 11),
        FlowEvent("f2", "task_finished", "work", 1, 12))
      q.processAllAvailable()
      mem.addData(FlowEvent("f2", "tasks_enumerated", "work", 3, 5))
      q.processAllAvailable()
      val late = spark.table("flowstate").collect()
        .filter(_.getString(0) == "f2").last
      assert(late.getLong(2) == 3 && late.getLong(4) == 0)
      assert(late.getBoolean(5),
        "barrier must fire after a late tasks_enumerated")
    } finally q.stop()
  }
}

object StreamingSpec {
  // top-level so Spark can derive a product Encoder (an inner class
  // would need the test instance's scope)
  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
}
