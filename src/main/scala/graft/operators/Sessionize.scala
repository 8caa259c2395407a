package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the custom-stateful-op
  * pattern (per-key ordered fold) done batch-side with
  * `groupByKey.flatMapGroups`. Each user's events are folded in (ts,
  * event_id) order; a new session starts when the gap exceeds
  * `gapMinutes`. Scale: one shuffle on user_id; per-group state is a
  * single running session accumulator (events within a group stream
  * through after an in-task sort).
  *
  * The same kernel drives the Structured Streaming variant
  * (flatMapGroupsWithState) — see graft.streaming.StreamingOps.
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class Session(
      user_id: Long, session_id: Int, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp)

  /** events must have (user_id LONG, event_id LONG, ts TIMESTAMP, value
    * DOUBLE). Output one row per session: (user_id, session_id 0-based,
    * n_events, start_ts, end_ts). */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        // micros = epoch-seconds * 1e6 + fractional-second micros (getTime
        // already includes nanos/1e6, so getTime*1000 + getNanos/1000 would
        // double-count the sub-second part and mis-order fractional events;
        // floorDiv because getTime is negative pre-epoch while getNanos is
        // always the non-negative fraction)
        val evs = it.toArray.sortBy(e =>
          (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000, e.event_id))
        sessionsOf(uid, evs, gapMicros)
      }
      .toDF()
  }

  private def sessionsOf(uid: Long, evs: Array[Event], gapMicros: Long): Iterator[Session] = {
    if (evs.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    @inline def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    var sessionId = 0
    var start = evs(0).ts
    var last = evs(0).ts
    var n = 1L
    var i = 1
    while (i < evs.length) {
      val e = evs(i)
      if (micros(e.ts) - micros(last) > gapMicros) {
        out += Session(uid, sessionId, n, start, last)
        sessionId += 1
        start = e.ts
        n = 0L
      }
      n += 1
      last = e.ts
      i += 1
    }
    out += Session(uid, sessionId, n, start, last)
    out.iterator
  }
}
