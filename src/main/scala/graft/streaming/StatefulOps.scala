package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2 Part B incremental row):
  * `flatMapGroupsWithState` per-key state machines and a
  * `foreachBatch` idempotent sink — the streaming forms of the
  * reference's watermark-resume + truncate-reload loop
  * (/root/reference/src/main.py:195-267).
  */
object StatefulOps {

  final case class EventIn(user_id: Long, event_id: Long, value: Double)
  final case class UserState(nEvents: Long, total: Double)
  final case class UserUpdate(user_id: Long, n_events: Long, total_value: Double, high_activity: Boolean)

  /** Per-user running aggregate with a high-activity flag once a user
    * crosses `threshold` events — a custom state machine that windowed
    * aggs can't express. State is per-key and O(1); at scale it lives
    * in the (RocksDB) state store partitioned by user. */
  def runningUserStats(events: Dataset[EventIn], threshold: Long): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[EventIn], state: GroupState[UserState]) => {
          var st = state.getOption.getOrElse(UserState(0L, 0.0))
          val out = batch.map { e =>
            st = UserState(st.nEvents + 1, st.total + e.value)
            UserUpdate(userId, st.nEvents, st.total, st.nEvents >= threshold)
          }.toList
          state.update(st)
          out.iterator
        })
  }

  /** Idempotent micro-batch sink: every batch is merged latest-wins on
    * `keys` into the parquet target — replays of a batch (restart,
    * reprocessing) converge to the same table, which is the correct
    * generalization of the reference's truncate-reload (A16).
    * `orderCol`+`tiebreaks` pick the deterministic winner exactly like
    * the batch operator. */
  def idempotentSink(stream: DataFrame, path: String, keys: Seq[String],
      orderCol: String, tiebreaks: Seq[String]) =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dst = new org.apache.hadoop.fs.Path(path)
        val bak = new org.apache.hadoop.fs.Path(path + ".bak")
        val stage = new org.apache.hadoop.fs.Path(path + ".staging")
        // resolve the FS of the TARGET path, not the default FS
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // crash recovery: if a previous swap died between moving the
        // live table aside and promoting the staging dir, fall back to
        // the backup so history is never silently dropped
        val source =
          if (fs.exists(dst)) Some(dst)
          else if (fs.exists(bak)) Some(bak)
          else None
        val existing = source.map(p => spark.read.parquet(p.toString))
        val all = existing.fold(batch)(e => e.unionByName(batch))
        val merged = graft.operators.IngestOps.dedupLatest(all, keys, orderCol, tiebreaks)
        // three-step swap: stage → move live aside → promote staging.
        // At every crash point either dst or bak holds the full merged
        // history (an overwrite-in-place would read+write the same
        // files AND truncate on failure).
        merged.write.mode("overwrite").parquet(stage.toString)
        if (fs.exists(dst)) {
          // bak only gets dropped once dst has been moved into it (so a
          // crash here still leaves dst) or after a successful promote
          fs.delete(bak, true)
          if (!fs.rename(dst, bak))
            throw new java.io.IOException(s"idempotentSink: cannot move $dst aside")
        }
        if (!fs.rename(stage, dst))
          throw new java.io.IOException(s"idempotentSink: promote $stage -> $dst failed")
        fs.delete(bak, true)
        ()
    }
}
