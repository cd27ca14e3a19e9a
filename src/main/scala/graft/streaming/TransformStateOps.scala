package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
}
