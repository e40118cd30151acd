package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming == batch for the windowed aggregation; stateful sessionization
  * across triggers.
  */
class StreamsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private val events = Seq(
    Event(1L, "click", ts(0), 1.0), Event(1L, "click", ts(1), 2.0),
    Event(1L, "view", ts(30), 3.0), Event(2L, "click", ts(2), 4.0),
    Event(2L, "click", ts(45), 5.0), Event(1L, "click", ts(46), 6.0))

  test("streaming windowed aggregation equals the batch plan (memory sink)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val agg = Streams.windowedCounts(mem.toDF(), "ts", "event_type", "15 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win_out")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val expected = Streams.windowedCounts(events.toDF(), "ts", "event_type", "15 minutes")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("corpus split/mixture assignment runs unchanged on a stream (stateless per-row)") {
    // splitAssign and mixtureExpand are pure per-row arithmetic + explode —
    // no state, no watermark — so the SAME code runs over readStream
    // micro-batches with outputs identical to the batch plan; this is the
    // ingestion shape (docs arrive continuously, split/epoch assigned on
    // arrival, stable forever after because assignment is a pure id fn)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = (0L until 200L).map(id => (id, s"dom${id % 5}"))
    mem.addData(docs: _*)
    val streamed = graft.text.Corpus.mixtureExpand(
      graft.text.Corpus.splitAssign(
        mem.toDF().toDF("doc_id", "source"), "doc_id",
        Seq("train" -> 9000, "val" -> 500, "test" -> 500)),
      "doc_id", "source", Map("dom0" -> 25000, "dom4" -> 2500))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("corpus_stream_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("corpus_stream_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val batch = graft.text.Corpus.mixtureExpand(
      graft.text.Corpus.splitAssign(
        docs.toDF("doc_id", "source"), "doc_id",
        Seq("train" -> 9000, "val" -> 500, "test" -> 500)),
      "doc_id", "source", Map("dom0" -> 25000, "dom4" -> 2500))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("batch sessionization splits by event-time gap") {
    val sessions = Streams.sessionize(events.toDS(), gapMs = 10 * 60 * 1000, streaming = false)
      .collect().map(s => (s.user_id, s.start, s.end, s.n_events, s.sum_value)).toSet
    assert(sessions === Set(
      (1L, ts(0), ts(1), 2, 3.0),   // 0,1 then 30 breaks the 10min gap
      (1L, ts(30), ts(30), 1, 3.0),
      (1L, ts(46), ts(46), 1, 6.0),
      (2L, ts(2), ts(2), 1, 4.0),
      (2L, ts(45), ts(45), 1, 5.0)))
  }

  test("streaming sessionization carries state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000, streaming = true)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(Event(1L, "a", ts(0), 1.0), Event(1L, "a", ts(1), 2.0))
      q.processAllAvailable()
      // same session continues in the next trigger: no session closed yet
      mem.addData(Event(1L, "a", ts(5), 3.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0)
      // a far event closes the first session (gap exceeded)
      mem.addData(Event(1L, "a", ts(40), 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .collect().map(s => (s.getLong(0), s.getTimestamp(1), s.getTimestamp(2), s.getInt(3)))
      assert(closed.toSeq === Seq((1L, ts(0), ts(5), 3)),
        "first session spans both triggers before closing")
    } finally q.stop()
  }

  test("cross-trigger out-of-order event cannot regress the session end — regression") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000, streaming = true)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo").start()
    try {
      mem.addData(Event(1L, "a", ts(8), 1.0))
      q.processAllAvailable()
      // an EARLIER (but in-session) event arrives in the next trigger: it
      // must merge via min/max — the old code set lastMs = 2, making the
      // session end precede its start and mis-measuring the next gap
      mem.addData(Event(1L, "a", ts(2), 2.0))
      q.processAllAvailable()
      // ts(17) is 9 min after the TRUE last event ts(8) (within gap) but
      // 15 min after the regressed ts(2): the buggy state closed here
      mem.addData(Event(1L, "a", ts(17), 3.0))
      q.processAllAvailable()
      assert(spark.table("sess_ooo").count() === 0, "session must still be open")
      mem.addData(Event(1L, "a", ts(50), 4.0)) // real gap: closes it
      q.processAllAvailable()
      val closed = spark.table("sess_ooo")
        .collect().map(s => (s.getLong(0), s.getTimestamp(1), s.getTimestamp(2), s.getInt(3)))
      assert(closed.toSeq === Seq((1L, ts(2), ts(17), 3)),
        "one session, start=min, end=max over all three events")
    } finally q.stop()
  }

  test("batch dedupeStream keeps the EARLIEST event per key, deterministically") {
    import spark.implicits._
    val rows = Seq(
      Event(1L, "k", ts(30), 9.0), Event(1L, "k", ts(3), 1.0), Event(1L, "k", ts(10), 5.0),
      Event(2L, "k", ts(7), 2.0))
      .toDF()
    val got = Streams.dedupeStream(rows, Seq("user_id", "event_type"), "ts", "10 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getDouble(3))).toSet
    assert(got === Set((1L, ts(3), 1.0), (2L, ts(7), 2.0)),
      "first ARRIVAL must mean earliest event time, not partition luck")
  }

  test("idle-flush sessionization is replay-deterministic (event-time timeout)") {
    implicit val sqlCtx = spark.sqlContext
    // the idle flush must be driven by the WATERMARK (event time), not the
    // wall clock: replaying the same batches yields the same sessions
    def runOnce(name: String): Set[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)] = {
      val mem = MemoryStream[Event]
      val out = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000,
        streaming = true, idleFlush = true)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        mem.addData(Event(1L, "a", ts(0), 1.0), Event(1L, "a", ts(1), 2.0))
        q.processAllAvailable()
        // user 1 never appears again: only the watermark advanced by user
        // 2's event time can flush user 1's idle session
        mem.addData(Event(2L, "b", ts(40), 4.0))
        q.processAllAvailable()
        // the timeout fires on the no-data batch after the watermark moves;
        // give the engine a bounded moment to run it
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.table(name).count() < 1 && System.nanoTime() < deadline)
          Thread.sleep(100)
        spark.table(name).collect()
          .map(s => (s.getLong(0), s.getTimestamp(1), s.getTimestamp(2), s.getInt(3))).toSet
      } finally q.stop()
    }
    val first = runOnce("replay_a")
    val second = runOnce("replay_b")
    assert(first === second, "replay must produce identical sessions")
    assert(first.contains((1L, ts(0), ts(1), 2)),
      s"idle session must flush via the watermark: $first")
  }

  test("late event past the watermark is dropped, not resurrected into a flushed session") {
    implicit val sqlCtx = spark.sqlContext
    // watermarkDelay defaults to "0 seconds": the moment the watermark
    // passes an event's timestamp, that event is LATE and the state
    // operator filters it before the session function ever sees it. This
    // pins the semantics — a late event can neither reopen a flushed
    // session nor open a phantom new one.
    val mem = MemoryStream[Event]
    val out = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000,
      streaming = true, idleFlush = true)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def sessions(): Set[(Long, java.sql.Timestamp, java.sql.Timestamp, Int, Double)] =
      spark.table("late_out").collect()
        .map(s => (s.getLong(0), s.getTimestamp(1), s.getTimestamp(2),
          s.getInt(3), s.getDouble(4))).toSet
    def awaitCount(n: Long): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("late_out").count() < n && System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      mem.addData(Event(1L, "a", ts(0), 1.0))
      q.processAllAvailable()
      mem.addData(Event(2L, "b", ts(40), 4.0)) // watermark advances to ts(40)
      q.processAllAvailable()
      awaitCount(1) // user 1's idle session flushes via the event-time timeout
      assert(sessions().contains((1L, ts(0), ts(0), 1, 1.0)))
      val afterFlush = spark.table("late_out").count()
      // LATE: ts(1) is far below the ts(40) watermark — must be dropped
      mem.addData(Event(1L, "a", ts(1), 9.0))
      q.processAllAvailable()
      assert(spark.table("late_out").count() === afterFlush,
        s"late event must not emit or reopen a session: ${sessions()}")
      // an on-time event still opens a fresh session; advance the watermark
      // far enough to flush everything so the late event had every chance
      // to surface before we assert it never did
      mem.addData(Event(1L, "a", ts(50), 5.0))
      q.processAllAvailable()
      mem.addData(Event(2L, "b", ts(80), 2.0))
      q.processAllAvailable()
      awaitCount(3) // user 1 @50 and user 2 @40 both idle-flush
      val got = sessions()
      assert(got.contains((1L, ts(50), ts(50), 1, 5.0)),
        s"on-time event after the late one must session normally: $got")
      assert(got.contains((2L, ts(40), ts(40), 1, 4.0)), s"$got")
      assert(!got.exists(s => s._5 == 9.0 || s._2 == ts(1) || s._3 == ts(1)),
        s"the late ts(1) event leaked into a session: $got")
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.dedupeStream(mem.toDF(), Seq("user_id", "event_type"), "ts", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      mem.addData(Event(1L, "click", ts(0), 1.0), Event(1L, "click", ts(0), 1.0))
      q.processAllAvailable()
      // duplicate key in a LATER trigger, still within the watermark window
      mem.addData(Event(1L, "click", ts(5), 9.0), Event(2L, "view", ts(6), 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.count(_ == ((1L, "click"))) === 1, s"cross-trigger duplicate kept: $got")
      assert(got.contains((2L, "view")))
      assert(got.length === 2)
    } finally q.stop()
  }

  test("dedup stream==batch on in-order arrivals; out-of-order picks are documented") {
    // the documented contract: identical rows when each key's duplicates
    // arrive in event-time order; key-set equality always; representative
    // MAY differ when non-identical duplicates arrive out of event-time
    // order (streaming keeps first ARRIVAL, batch keeps min EVENT TIME)
    implicit val sqlCtx = spark.sqlContext
    val inOrder = Seq(
      Event(1L, "click", ts(0), 1.0), Event(1L, "click", ts(5), 9.0),
      Event(2L, "view", ts(3), 2.0))
    val outOfOrder = Seq( // key 3's LATER event arrives first
      Event(3L, "click", ts(8), 8.0), Event(3L, "click", ts(2), 2.0))
    def streamed(events: Seq[Event], name: String) = {
      val mem = MemoryStream[Event]
      val q = Streams.dedupeStream(mem.toDF(), Seq("user_id", "event_type"), "ts", "30 minutes")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        events.foreach { e => mem.addData(e); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getDouble(3))).toSet
      } finally q.stop()
    }
    def batched(events: Seq[Event]) =
      Streams.dedupeStream(events.toDF(), Seq("user_id", "event_type"), "ts", "30 minutes")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getDouble(3))).toSet
    // in-order: row-identical
    assert(streamed(inOrder, "dedup_inorder") === batched(inOrder))
    // out-of-order: key set identical, representatives differ as documented
    val s = streamed(outOfOrder, "dedup_ooo")
    val b = batched(outOfOrder)
    assert(s.map(t => (t._1, t._2)) === b.map(t => (t._1, t._2)), "key sets must agree")
    assert(s === Set((3L, "click", ts(8), 8.0)), s"stream keeps first arrival: $s")
    assert(b === Set((3L, "click", ts(2), 2.0)), s"batch keeps min event time: $b")
  }

  test("batch sessionize streams a hot key: one pre-sort, no group materialization") {
    // two users, one with 500k events, in scrambled input order: sessions
    // of 3 events (0s, 10s, 20s apart), one-hour gaps between sessions
    val n = 500000
    val j = floor(col("id") / 2).cast("long")
    val hot = spark.range(2L * n).select(
      (pmod(col("id"), lit(2L)) + 1L).as("user_id"),
      concat(lit("e"), pmod(j, lit(3L))).as("event_type"),
      timestamp_millis(lit(1700000000000L) +
        floor(j / 3).cast("long") * 3600000L + pmod(j, lit(3L)) * 10000L).as("ts"),
      lit(1.0).as("value"))
      .orderBy(xxhash64(col("id"))) // scrambled input order
      .as[Event]
    val ds = Streams.sessionize(hot, gapMs = 30 * 60 * 1000, streaming = false)

    // plan shape: exactly the ONE (user_id, ts) sort we planted below the
    // batch state operator (MapGroups) — EnsureRequirements added no second
    // exchange or sort, so the group iterator arrives time-ordered and the
    // function never materializes the group
    val plan = ds.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val belowState = plan.split("MapGroups", 2)
    assert(belowState.length === 2, s"no MapGroups in plan:\n$plan")
    assert(" Sort ".r.findAllIn(belowState(1)).size === 1,
      s"expected exactly the planted sort below the state operator:\n$plan")
    assert("Exchange".r.findAllIn(belowState(1)).size === 1,
      s"expected exactly the planted exchange below the state operator:\n$plan")

    val sessions = ds.collect()
    assert(sessions.length === 2 * ((n + 2) / 3)) // last session gets n%3 events
    val full = sessions.filter(_.n_events === 3)
    assert(full.length === 2 * (n / 3))
    assert(full.forall(s => s.sum_value === 3.0 &&
      s.end.getTime - s.start.getTime === 20000L))
    assert(sessions.filter(_.n_events === n % 3).length === (if (n % 3 == 0) 0 else 2))
  }
}
