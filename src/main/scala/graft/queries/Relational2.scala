package graft.queries

import graft.Tables
import graft.functions.Udafs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational coverage batch: quantiles, ordered collect
  * aggregates, pivot, navigation window functions, extended string
  * scalars, and the custom-Aggregator (UDAF) surface.
  */
object Relational2 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Exact integer cents from a 2dp double price. */
  private def cents(c: String) = round(col(c) * 100, 0).cast("long")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("agg_quantiles", Some("""
      SELECT o_orderstatus,
             round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
             round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
      t(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(
          round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
          round(percentile(col("o_totalprice"), lit(0.50)), 4).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
          round(percentile(col("o_totalprice"), lit(0.95)), 4).as("p95"))
        .orderBy(col("o_orderstatus"))
    },

    QueryDef("agg_collect", Some("""
      SELECT o_custkey,
             array_to_string(list(o_orderkey ORDER BY o_orderkey)[1:16], ',') AS order_keys,
             CAST(LEAST(count(*), 16) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")) { (s, d) =>
      // BOUNDED ordered collect — first 16 order keys per customer. A
      // rn<=16 pre-limit runs BEFORE the groupBy and plans as a
      // partial+final WindowGroupLimit (same pattern as
      // events_top_paths), so per-group aggregation state is O(16) by
      // construction — an unbounded collect_list is the one agg whose
      // buffer a power-law key can blow up at 100 TB, even when only a
      // prefix of the list is consumed downstream. The window and the
      // groupBy share the o_custkey exchange (o_orderkey is globally
      // unique, so the order — and the surviving 16 — are total/
      // deterministic). collect_list order is nondeterministic →
      // array_sort pins it; the sorted list is emitted as a joined
      // STRING: array-typed output columns crash the driver comparator
      // (round-1 verdict).
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 16).drop("__rn")
        .groupBy(col("o_custkey"))
        .agg(array_join(array_sort(collect_list(col("o_orderkey"))).cast("array<string>"), ",")
          .as("order_keys"),
          count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    },

    QueryDef("pivot_status", Some("""
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))   // explicit values: no discovery job
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy(col("o_orderpriority"))
    },

    /** Recursive CTE (Spark 4 WITH RECURSIVE): per-customer active
      * month span expanded recursively from first to last order month.
      * Depth-bounded at 6 (n_months caps at 6): every customer
      * advances together each step, so the iteration count is the
      * depth bound — not the row count, and not the longest span —
      * which is the only sane recursion contract at scale. */
    QueryDef("recursive_months", Some("""
      WITH RECURSIVE m(c, mon, last_mon, depth) AS (
        SELECT o_custkey, date_trunc('month', min(o_orderdate)), date_trunc('month', max(o_orderdate)), 1
        FROM orders GROUP BY o_custkey
        UNION ALL
        SELECT c, mon + INTERVAL 1 MONTH, last_mon, depth + 1
        FROM m WHERE mon < last_mon AND depth < 6)
      SELECT c AS o_custkey, count(*) AS n_months
      FROM m GROUP BY c ORDER BY o_custkey""")) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("graft_q_rec_orders")
      s.sql("""
        WITH RECURSIVE m(c, mon, last_mon, depth) AS (
          SELECT o_custkey, date_trunc('month', min(o_orderdate)), date_trunc('month', max(o_orderdate)), 1
          FROM graft_q_rec_orders GROUP BY o_custkey
          UNION ALL
          SELECT c, mon + INTERVAL '1' MONTH, last_mon, depth + 1
          FROM m WHERE mon < last_mon AND depth < 6)
        SELECT c AS o_custkey, count(*) AS n_months
        FROM m GROUP BY c ORDER BY o_custkey""")
    },

    // Time-interval RANGE frame: trailing-30-day order count per
    // customer — the event-time sliding-window idiom in window form.
    QueryDef("win_range_interval", Some("""
      SELECT o_orderkey,
             CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_30d
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("graft_q_wri_orders")
      s.sql("""
        SELECT o_orderkey,
               CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_30d
        FROM graft_q_wri_orders ORDER BY o_orderkey""")
    },

    // UNPIVOT — the inverse of pivot_status: wide per-status counts
    // melt back to (priority, status, n) rows via Spark's native
    // unpivot (plans as Expand, one pass, no shuffle beyond the agg).
    QueryDef("pivot_unpivot", Some("""
      WITH p AS (SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS P
                 FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, status, n FROM p
      UNPIVOT (n FOR status IN (F, O, P))
      ORDER BY o_orderpriority, status""")) { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .unpivot(Array(col("o_orderpriority")), Array(col("F"), col("O"), col("P")),
          "status", "n")
        .orderBy(col("o_orderpriority"), col("status"))
    },

    // Error-safe scalar evaluation — the idiomatic answer to Spark 4's
    // ANSI mode (failed casts yield NULL instead of runtime errors).
    //
    // Scale note (measured, sf0.1): TRY-mode cast reaches NULL by
    // THROWING and catching a SparkNumberFormatException per malformed
    // row — on a column that is never numeric (o_orderstatus is F/O/P)
    // that is one JVM exception per row, 1.3 s of the query's former
    // 3.0 s here and CPU-hours at 100 TB. st_num therefore goes through
    // SafeCast.tryLong — try_cast's exact semantics behind a
    // compiled-regex tier that never throws on the hot path (3.8x
    // faster on exception-dominated data; SafeCastSpec proves the
    // equivalence differentially). prio_num keeps the bare form: its
    // input always parses, and a cast that succeeds never touches the
    // exception machinery.
    QueryDef("scalar_try", Some("""
      SELECT o_orderkey,
             TRY_CAST(o_orderstatus AS BIGINT) AS st_num,
             TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
             round(o_totalprice / nullif(o_orderkey % 3, 0), 6) AS safe_div
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      // sort first, project after (see scalar_math): the projection
      // below .orderBy would run the guards twice (range-partitioner
      // sampling pass) and shuffle the computed columns.
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"),
        graft.functions.SafeCast.tryLong(col("o_orderstatus")).as("st_num"),
        expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").as("prio_num"),
        round(col("o_totalprice") / nullif(col("o_orderkey") % 3, lit(0)), 6).as("safe_div"))
    },

    QueryDef("win_navigation", Some("""
      SELECT o_custkey, o_orderkey,
             CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
             first_value(o_orderkey) OVER w AS first_key,
             last_value(o_orderkey) OVER w AS last_key,
             nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")) { (s, d) =>
      val wN = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(wN).cast("long").as("quartile"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    QueryDef("scalar_string2", Some("""
      SELECT p_partkey,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
             split_part(p_type, ' ', 1) AS type_head,
             translate(p_brand, 'B#', 'b-') AS trans,
             CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev,
             left(p_name, 3) AS l3, right(p_name, 3) AS r3,
             repeat(p_brand, 2) AS rep
      FROM part ORDER BY p_partkey""")) { (s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        substring_index(col("p_type"), " ", 1).as("type_head"),
        translate(col("p_brand"), "B#", "b-").as("trans"),
        levenshtein(col("p_brand"), lit("Brand#1")).cast("long").as("lev"),
        expr("left(p_name, 3)").as("l3"), expr("right(p_name, 3)").as("r3"),
        repeat(col("p_brand"), 2).as("rep"))
        .orderBy(col("p_partkey"))
    },

    /** Correlated scalar subquery — Catalyst decorrelates it into a
      * left outer aggregate join (no per-row execution at scale). */
    QueryDef("subquery_scalar", Some("""
      SELECT o_orderkey,
             (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items,
             CAST((SELECT sum(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem
                   WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("graft_q_sub_orders")
      t(s, d, "lineitem").createOrReplaceTempView("graft_q_sub_lineitem")
      s.sql("""
        SELECT o_orderkey,
               (SELECT count(*) FROM graft_q_sub_lineitem WHERE l_orderkey = o_orderkey) AS n_items,
               CAST((SELECT sum(CAST(l_quantity AS DECIMAL(18,2))) FROM graft_q_sub_lineitem
                     WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
        FROM graft_q_sub_orders ORDER BY o_orderkey""")
    },

    QueryDef("subquery_in", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer").createOrReplaceTempView("graft_q_in_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_q_in_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM graft_q_in_customer
        WHERE c_custkey IN (SELECT o_custkey FROM graft_q_in_orders WHERE o_totalprice > 400000)
          AND c_custkey NOT IN (SELECT o_custkey FROM graft_q_in_orders WHERE o_orderstatus = 'P')
        ORDER BY c_custkey""")
    },

    QueryDef("join_lateral", Some("""
      SELECT o_orderkey, l.max_price, l.n FROM orders,
        LATERAL (SELECT max(l_extendedprice) AS max_price,
                        count(*) AS n
                 FROM lineitem WHERE l_orderkey = o_orderkey) l
      ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("graft_q_lat_orders")
      t(s, d, "lineitem").createOrReplaceTempView("graft_q_lat_lineitem")
      s.sql("""
        SELECT o_orderkey, l.max_price, l.n FROM graft_q_lat_orders,
          LATERAL (SELECT max(l_extendedprice) AS max_price,
                          count(*) AS n
                   FROM graft_q_lat_lineitem WHERE l_orderkey = o_orderkey) l
        ORDER BY o_orderkey""")
    },

    QueryDef("scalar_regex", Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '^[a-z]+') AS first_word,
             regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
             regexp_matches(p_name, '^c') AS starts_c,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
      FROM part ORDER BY p_partkey""")) { (s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        col("p_name").rlike("^c").as("starts_c"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).cast("long").as("n_vowels"))
        .orderBy(col("p_partkey"))
    },

    QueryDef("scalar_bits", Some("""
      SELECT o_orderkey, CAST(bit_count(o_orderkey) AS BIGINT) AS bits,
             o_orderkey << 2 AS shl, o_orderkey >> 1 AS shr,
             o_orderkey & 255 AS band, o_orderkey | 16 AS bor,
             xor(o_orderkey, 255) AS bxor
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        bit_count(col("o_orderkey")).cast("long").as("bits"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"),
        col("o_orderkey").bitwiseAND(255).as("band"),
        col("o_orderkey").bitwiseOR(16).as("bor"),
        col("o_orderkey").bitwiseXOR(255).as("bxor"))
        .orderBy(col("o_orderkey"))
    },

    QueryDef("win_distribution", Some("""
      SELECT o_orderkey, o_orderstatus,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""")) { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    },

    /** Typed Dataset pipeline: case-class Encoders + groupByKey +
      * single-pass mapGroups, integer-exact so the oracle checks the
      * typed path itself. (mapGroups shuffles on the key like any
      * groupBy; the fold is one pass per group.) */
    QueryDef("typed_agg", Some("""
      SELECT o_orderstatus,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "orders").as[graft.Typed.Order]
      ds.groupByKey(_.o_orderstatus)
        .mapGroups { (status, orders) =>
          val (cents, n) = orders.foldLeft((0L, 0L)) { case ((c, k), o) =>
            (c + Math.round(o.o_totalprice * 100), k + 1)
          }
          (status, cents, n)
        }
        .toDF("o_orderstatus", "sum_cents", "n")
        .orderBy(col("o_orderstatus"))
    },

    // Custom typed Aggregators (UDAF surface): integer-exact, so the
    // oracle can check the custom-agg path itself.
    QueryDef("agg_udaf_cents", Some("""
      SELECT o_orderstatus,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // count(*) AS mean_cents_floor
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
      val sumCents = udaf(Udafs.SumCents)
      val meanCents = udaf(Udafs.MeanCentsFloor)
      t(s, d, "orders")
        .withColumn("cents", cents("o_totalprice"))
        .groupBy(col("o_orderstatus"))
        .agg(sumCents(col("cents")).as("sum_cents"),
          meanCents(col("cents")).as("mean_cents_floor"))
        .orderBy(col("o_orderstatus"))
    },
  )
}
