package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference has no stream semantics
  * (SURVEY.md §2.8) — these are the engine's additions for continuous
  * ingestion of the image/event firehose: identical transforms run in batch
  * and streaming (unified Dataset API), so every streaming query is
  * batch-checkable.
  */
object Streams {

  case class Event(user_id: Long, event_type: String, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
                     n_events: Int, sum_value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Int, total: Double)

  /** Tumbling event-time window aggregation; works unchanged on batch and
    * streaming inputs. Streaming callers add `withWatermark` upstream.
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("n"), col("min_value"), col("max_value"))

  /** Streaming source over a parquet directory (file-arrival stream). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Event-time gap sessionization via flatMapGroupsWithState — the custom
    * per-key state operator (KeyValueGroupedDataset). Emits a session when
    * the gap between consecutive events exceeds `gapMs`. Works in batch
    * (whole group at once) and streaming (state carries across triggers,
    * processing-time timeout flushes idle sessions).
    */
  def sessionize(ds: Dataset[Event], gapMs: Long, streaming: Boolean,
                 idleFlush: Boolean = false): Dataset[Session] = {
    import ds.sparkSession.implicits._

    def finish(uid: Long, st: SessionState): Session =
      Session(uid, new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.lastMs),
        st.n, st.total)

    val fn: (Long, Iterator[Event], GroupState[SessionState]) => Iterator[Session] =
      (uid, events, state) => {
        if (state.hasTimedOut) {
          val out = state.getOption.map(finish(uid, _)).iterator
          state.remove()
          out
        } else {
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(SessionState(s.startMs, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += finish(uid, s)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (streaming) {
            cur.foreach(state.update)
            if (idleFlush) state.setTimeoutDuration(gapMs)
            closed.result().iterator
          } else {
            // batch: the group is complete — flush the open session too
            (closed.result() ++ cur.map(finish(uid, _))).iterator
          }
        }
      }

    val timeout =
      if (streaming && idleFlush) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }
}
