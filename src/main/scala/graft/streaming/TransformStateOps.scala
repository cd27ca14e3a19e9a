package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-state v2 (`transformWithState`) — the successor
  * API to `flatMapGroupsWithState` used by
  * [[StatefulOps.runningUserStats]]: typed composable state variables
  * behind a `StatefulProcessorHandle`, RocksDB-backed, with per-state
  * TTL and timers. Exercised here as a per-user running-totals state
  * machine so both state APIs are judged against the same kind of
  * batch oracle.
  *
  * Money is accumulated in integer CENTS (`math.round(value * 100)` —
  * fixture values are exact 2dp, so the double is within 1e-12 of the
  * true cent count and the round is exact), keeping the state and the
  * judged output order-independent integers: no IEEE summation drift
  * between micro-batch boundaries and the DuckDB decimal oracle.
  */
object TransformStateOps {

  final case class EvIn(user_id: Long, event_id: Long, value: Double)
  final case class Totals(n: Long, cents: Long)
  final case class TotalsOut(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-key running (count, cents) in a single ValueState; emits one
    * CUMULATIVE row per key per micro-batch that saw the key. State is
    * O(1) per user; at scale it lives in the RocksDB store partitioned
    * by user (transformWithState requires the RocksDB provider). */
  class RunningTotals extends StatefulProcessor[Long, EvIn, TotalsOut] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals](
        "totals", Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
        timerValues: TimerValues): Iterator[TotalsOut] = {
      var cur = if (totals.exists()) totals.get() else Totals(0L, 0L)
      rows.foreach { e =>
        cur = Totals(cur.n + 1L, cur.cents + math.round(e.value * 100))
      }
      totals.update(cur)
      Iterator.single(TotalsOut(key, cur.n, cur.cents))
    }
  }

  /** Wire the processor over a typed stream. TimeMode.None: the state
    * machine is input-driven (no timers); Append output. */
  def runningTotals(events: Dataset[EvIn]): Dataset[TotalsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Append())
  }

  final case class EvTyped(user_id: Long, event_type: String)
  final case class TypesOut(user_id: Long, n_types: Long)

  /** Per-key distinct-set tracking in a MapState (the state-v2 keyed
    * collection type; a ValueState[Set] would rewrite the whole set
    * per update — MapState point-writes only NEW members, the shape
    * that stays O(delta) when a key's set grows large). Emits the
    * cumulative distinct count per micro-batch that saw the key. */
  class DistinctTypes extends StatefulProcessor[Long, EvTyped, TypesOut] {
    @transient private var seen: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Boolean](
        "seen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvTyped],
        timerValues: TimerValues): Iterator[TypesOut] = {
      rows.foreach { e =>
        if (!seen.containsKey(e.event_type)) seen.updateValue(e.event_type, true)
      }
      Iterator.single(TypesOut(key, seen.keys().size.toLong))
    }
  }

  def distinctTypes(events: Dataset[EvTyped]): Dataset[TypesOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new DistinctTypes, TimeMode.None(), OutputMode.Append())
  }

  final case class TokIn(shard: Long, token: String)
  final case class SketchOut(shard: Long, token: String, floor_count: Long)

  /** Sharded streaming Misra-Gries ([[graft.operators.SketchOps]]'
    * batch kernel lifted into state v2): each shard keys all
    * occurrences of its tokens (hash-sharded), so the per-shard MG
    * guarantee covers the token's FULL stream — any token with global
    * frequency > N/(k+1) survives in its shard's final counters,
    * whatever the arrival order or micro-batch boundaries. Counters
    * live in a MapState (≤ k entries per shard — hard state bound at
    * any vocabulary size; the decrement storm is an O(k) point-write
    * burst). Each batch emits the shard's surviving-counter SNAPSHOT;
    * the union of snapshots across batches is a superset of the final
    * counters and therefore still a valid heavy-hitter candidate set —
    * callers confirm exactly and never rely on the floors. */
  class ShardMisraGries(k: Int) extends StatefulProcessor[Long, TokIn, SketchOut] {
    @transient private var counters: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TokIn],
        timerValues: TimerValues): Iterator[SketchOut] = {
      rows.foreach { t =>
        if (counters.containsKey(t.token)) {
          counters.updateValue(t.token, counters.getValue(t.token) + 1L)
        } else {
          val live = counters.keys().toSeq
          if (live.size < k) counters.updateValue(t.token, 1L)
          else live.foreach { tok =>
            val v = counters.getValue(tok) - 1L
            if (v <= 0L) counters.removeKey(tok) else counters.updateValue(tok, v)
          }
        }
      }
      counters.iterator().map { case (tok, c) => SketchOut(key, tok, c) }
    }
  }

  def shardSketch(toks: Dataset[TokIn], k: Int): Dataset[SketchOut] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.shard)
      .transformWithState(new ShardMisraGries(k), TimeMode.None(), OutputMode.Append())
  }

  final case class SessEv(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSess(start_us: Long, last_us: Long, n: Long, cents: Long)
  final case class SessTimerOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Sessionization rebuilt on state-v2 EVENT-TIME TIMERS — the one
    * state-v2 facility `stream_transform_state`/`stream_tws_distinct`
    * don't touch. Each per-user open session holds a registered timer
    * at its (would-be) close time; an in-gap arrival DELETES the timer,
    * extends the session, and re-registers; the session is emitted only
    * from `handleExpiredTimer`, i.e. only once the WATERMARK proves no
    * event can extend it — exactly `session_window`'s append-mode
    * contract, which is why the judged query shares
    * `stream_session_window`'s oracle verbatim.
    *
    * Precision: session arithmetic is exact microseconds; timers are
    * milliseconds, registered at ceil(end_us/1000) so "timer expired at
    * watermark W ms" ⟺ "end_us ≤ W·1000" — bit-aligned with the
    * session_window eviction predicate against the same ms watermark.
    *
    * Ordering contract: in-batch rows are sorted by event time here;
    * ACROSS batches the caller must deliver each key's events
    * nondecreasing (the day-file staging does), which keeps the
    * tail-session invariant: a new event can only ever merge into the
    * LATEST open session (any older session's gap window ended before
    * the newer session began). State is O(open sessions within the
    * watermark horizon) per user — the same bound session_window's
    * state store carries. */
  class SessionTimers(gapUs: Long) extends StatefulProcessor[Long, SessEv, SessTimerOut] {
    @transient private var sessions: org.apache.spark.sql.streaming.ListState[OpenSess] = _

    private def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    private def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    private def ceilMs(us: Long): Long = (us + 999L) / 1000L
    private def endUs(s: OpenSess): Long = s.last_us + gapUs

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[OpenSess]("sessions",
        Encoders.product[OpenSess], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessEv],
        timerValues: TimerValues): Iterator[SessTimerOut] = {
      var live = if (sessions.exists()) sessions.get().toVector else Vector.empty
      rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
        val us = micros(e.ts)
        val cents = math.round(e.value * 100)
        live.lastOption match {
          case Some(o) if us >= o.start_us && us - o.last_us <= gapUs =>
            getHandle.deleteTimer(ceilMs(endUs(o)))
            val merged = OpenSess(o.start_us, math.max(o.last_us, us), o.n + 1L, o.cents + cents)
            getHandle.registerTimer(ceilMs(endUs(merged)))
            live = live.init :+ merged
          case _ =>
            val s0 = OpenSess(us, us, 1L, cents)
            getHandle.registerTimer(ceilMs(endUs(s0)))
            live = live :+ s0
        }
      }
      if (live.isEmpty) sessions.clear() else sessions.put(live.toArray)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessTimerOut] = {
      val due = expiredTimerInfo.getExpiryTimeInMs
      val live = if (sessions.exists()) sessions.get().toVector else Vector.empty
      val (emit, keep) = live.partition(s => ceilMs(endUs(s)) <= due)
      if (keep.isEmpty) sessions.clear() else sessions.put(keep.toArray)
      emit.iterator.map(s =>
        SessTimerOut(key, tsOf(s.start_us), tsOf(endUs(s)), s.n, s.cents / 100.0))
    }
  }

  def sessionsByTimers(events: Dataset[SessEv],
      gapUs: Long = 1800L * 1000000L): Dataset[SessTimerOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimers(gapUs), TimeMode.EventTime(), OutputMode.Append())
  }
}
