package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom gap-sessionization as an explicit keyed state machine —
  * the flatMapGroupsWithState shape for session semantics the native
  * `session_window` can't express (per-session custom payloads,
  * early emission, side conditions).
  *
  * State per user: the open session (start, last-seen, count).
  * Events extend the session if within `gapSeconds` of last-seen;
  * otherwise the closed session is emitted and a new one opens.
  * An event-time timeout (watermark passing last-seen + gap) flushes
  * the final session — the same low-water-mark-driven completion the
  * reference drives off its clock floods (Payload.hs lwm maps).
  */
object SessionBolt {
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def sessions(events: DataFrame, gapSeconds: Long = 1800,
               watermark: String = "1 second"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      // keep the watermarked ts column — dropping it would detach the
      // watermark the event-time timeout needs
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startUs, s.lastUs, s.n))
          } else {
            var out = List.empty[SessionOut]
            var cur = state.getOption
            // batch-local interval for STRAGGLERS that precede the
            // open session entirely: `us - lastUs <= gapUs` alone
            // would let an arbitrarily EARLY late event (negative
            // difference) merge into the open session without
            // extending its start — counting an event hours outside
            // the emitted [start, end] window. Stragglers instead
            // build their own (older) session, which merges with the
            // open one only if the gap actually closes.
            var old: Option[OpenSession] = None
            rows.toSeq.sortBy(_._2).foreach { case (_, us, _) =>
              cur match {
                case Some(s) if us >= s.startUs - gapUs && us - s.lastUs <= gapUs =>
                  cur = Some(OpenSession(math.min(s.startUs, us),
                    math.max(s.lastUs, us), s.n + 1))
                case Some(s) if us < s.startUs - gapUs =>
                  old match {
                    case Some(o) if us - o.lastUs <= gapUs =>
                      old = Some(o.copy(lastUs = math.max(o.lastUs, us), n = o.n + 1))
                    case Some(o) =>
                      out ::= SessionOut(user, o.startUs, o.lastUs, o.n)
                      old = Some(OpenSession(us, us, 1))
                    case None =>
                      old = Some(OpenSession(us, us, 1))
                  }
                case Some(s) =>
                  // closing the open session MID-BATCH: earlier
                  // late-but-allowed merges may have lowered its start
                  // to within gap of the straggler interval — fold it
                  // in exactly like the end-of-batch check below, or
                  // one true session splits into two with wrong
                  // bounds/counts (r20 review find: state [100,200],
                  // batch 30,45,55,300 at gap 50 emitted [30,45] +
                  // [55,200] instead of [30,200])
                  old match {
                    case Some(o) if s.startUs - o.lastUs <= gapUs =>
                      out ::= SessionOut(user, math.min(o.startUs, s.startUs),
                        math.max(o.lastUs, s.lastUs), o.n + s.n)
                      old = None
                    case _ =>
                      out ::= SessionOut(user, s.startUs, s.lastUs, s.n)
                  }
                  cur = Some(OpenSession(us, us, 1))
                case None =>
                  cur = Some(OpenSession(us, us, 1))
              }
            }
            // the straggler interval either grew to within gap of the
            // open session (merge) or closes as its own session
            (old, cur) match {
              case (Some(o), Some(s)) if s.startUs - o.lastUs <= gapUs =>
                cur = Some(OpenSession(math.min(o.startUs, s.startUs),
                  math.max(o.lastUs, s.lastUs), o.n + s.n))
              case (Some(o), _) =>
                out ::= SessionOut(user, o.startUs, o.lastUs, o.n)
              case _ =>
            }
            cur.foreach { s =>
              state.update(s)
              // flush when the watermark passes the session's gap
              // horizon. Late-but-allowed events (rows behind the
              // watermark are filtered by the operator, but anything
              // inside the allowed lateness still arrives) can put
              // that horizon BEFORE the current watermark — Spark
              // throws on such a timeout and kills the query — so
              // clamp to just past the watermark.
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, (s.lastUs + gapUs) / 1000))
            }
            out.reverseIterator
          }
      }
  }
}
