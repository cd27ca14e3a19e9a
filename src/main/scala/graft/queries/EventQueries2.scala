package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second event-analytics batch: sequence/path mining, statistical
  * anomaly detection over exact integer sums, and SCD2 history
  * construction — the change-tracking complement to `merge_upsert`.
  */
object EventQueries2 {

  val defs: Seq[QueryDef] = Seq(

    /** Clickstream path mining: each user's first five events (in time
      * order) become a path string, then paths are ranked by frequency.
      * One hash aggregate per level — collect_list stays bounded because
      * only the first 5 elements survive (at 100 TB you'd pre-limit with
      * a row_number window; at fixture scale per-user event counts are
      * already small, and the slice keeps the output row narrow). The
      * struct sort (ts, event_id, event_type) is a total order, so the
      * path is deterministic under parallel collection. */
    QueryDef("events_top_paths", Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
      p AS (SELECT user_id,
              array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
            FROM e GROUP BY 1)
      SELECT path, count(*) AS n_users FROM p GROUP BY 1
      ORDER BY n_users DESC, path""")) { (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_join(
          slice(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")),
            1, 5),
          ">").as("path"))
      perUser.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    },

    /** Z-score anomaly detection per event type. Parity strategy: the
      * 2dp `value` quantizes losslessly to integer cents, so sum and
      * sum-of-squares are EXACT integers (order-independent — a double
      * sum would hash-mismatch); mean/variance/z then run one identical
      * double chain on both engines. The stats frame is 5 rows →
      * broadcast back onto the fact scan: one aggregate + one broadcast
      * join, no second fact shuffle at any scale. */
    QueryDef("events_anomaly", Some("""
      WITH c AS (SELECT event_id, event_type, value,
                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      st AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS sc,
                    CAST(sum(cents * cents) AS BIGINT) AS sq, count(*) AS n
             FROM c GROUP BY 1),
      z AS (SELECT c.event_id, c.event_type, c.value,
              (CAST(c.cents AS DOUBLE) - CAST(st.sc AS DOUBLE) / st.n)
                / sqrt(CAST(st.sq AS DOUBLE) / st.n
                       - (CAST(st.sc AS DOUBLE) / st.n) * (CAST(st.sc AS DOUBLE) / st.n)) AS zs
            FROM c JOIN st USING (event_type))
      SELECT event_id, event_type, value, zs AS z
      FROM z WHERE abs(zs) > 2 ORDER BY event_id""")) { (s, d) =>
      val c = Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100).cast("long").as("cents"))
      val st = c.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("sc"), sum(col("cents") * col("cents")).as("sq"),
          count(lit(1)).as("n"))
      val mean = col("sc").cast("double") / col("n")
      val z = (col("cents").cast("double") - mean) /
        sqrt(col("sq").cast("double") / col("n") - mean * mean)
      c.join(broadcast(st), "event_type")
        .withColumn("z", z)
        .filter(abs(col("z")) > 2)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy(col("event_id"))
    },

    /** SCD2 (slowly-changing-dimension type 2) history: each event is a
      * state observation; valid_from/valid_to intervals come from one
      * lead() window per user, with the open-ended row flagged current.
      * One shuffle+sort on user_id builds the entire history — the
      * standard way to materialize CDC streams into queryable
      * point-in-time tables. */
    QueryDef("scd2_history", Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT user_id, event_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      FROM e ORDER BY user_id, valid_from, event_id""")) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("state"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },
  )
}
