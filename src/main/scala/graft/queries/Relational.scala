package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Part-B relational query surface (SURVEY.md §2 Part B): the analysis
  * layer the reference delegates to its warehouse (README.md:3,125-127),
  * expressed as declarative DataFrame plans so Catalyst handles predicate
  * pushdown, column pruning, join reordering, and AQE.
  *
  * Scale notes baked into each plan:
  *  - dimension tables (region/nation/supplier/part, and filtered
  *    customer) are `broadcast()` — no shuffle of the fact side;
  *  - fact⋈fact joins (lineitem⋈orders) shuffle once on the join key and
  *    reuse that partitioning for the following aggregation where the
  *    grouping key is a superset;
  *  - every aggregate is partial (map-side combine) by construction.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ───── aggregation ─────
    QueryDef("q01_agg", Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice")} AS sum_base_price,
             $revenueSql AS sum_disc_price,
             ${davgSql("l_quantity")} AS avg_qty,
             ${davgSql("l_extendedprice")} AS avg_price,
             ${davgSql("l_discount")} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenue.as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    QueryDef("agg_distinct", Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // HLL sketch under the oracle gate, self-certifying: the judged
    // columns are the deterministic ones (exact count, row count) plus
    // an in-plan bound check `within_10pct` comparing the HLL estimate
    // to the exact count. The oracle asserts the bound holds (TRUE): if
    // the sketch ever drifts past 10 % relative error the boolean flips
    // and the driver's hash check goes red — the estimate itself never
    // needs to be engine-portable.
    QueryDef("agg_approx_distinct", Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             count(*) AS n_rows, TRUE AS within_10pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("est"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
          (abs(col("est") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.10).as("within_10pct"))
        .orderBy(col("l_returnflag"))
    },

    // Quantile sketch (percentile_approx / KLL-style) under the oracle
    // gate, same self-certifying shape as agg_approx_distinct: judged
    // columns are the EXACT interpolated percentiles (engine-portable)
    // plus `within_2pct`, an in-plan relative-error check of the sketch
    // against the exact values. The oracle asserts the bound (TRUE);
    // a sketch regression flips the boolean and fails the hash.
    //
    // Float-boundary hardening (round-4 advice): quantiles run over
    // INTEGER CENTS, not double prices. Interpolation at q ∈
    // {.25,.5,.75} is a + f·(b−a) with integer a,b and exactly-
    // representable f — an exact quarter-valued double in BOTH engines,
    // bit-identical with no rounding step to flake at a boundary.
    QueryDef("agg_approx_quantiles", Some("""
      WITH c AS (SELECT o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                 FROM orders)
      SELECT o_orderstatus,
             quantile_cont(cents, 0.25) AS p25_cents,
             quantile_cont(cents, 0.50) AS p50_cents,
             quantile_cont(cents, 0.75) AS p75_cents,
             count(*) AS n_rows, TRUE AS within_2pct
      FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
      val pcts = percentile_approx(col("cents"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
      val exact = percentile(col("cents"),
        array(lit(0.25), lit(0.5), lit(0.75)))
      val relErrOk = (i: Int) =>
        (abs(element_at(col("qs"), i).cast("double") - element_at(col("ex"), i))
          / element_at(col("ex"), i)) <= 0.02
      t(s, d, "orders")
        .withColumn("cents", (money(col("o_totalprice")) * 100).cast("long"))
        .groupBy(col("o_orderstatus"))
        .agg(pcts.as("qs"), exact.as("ex"), count(lit(1)).as("n_rows"))
        .select(col("o_orderstatus"),
          element_at(col("ex"), 1).as("p25_cents"),
          element_at(col("ex"), 2).as("p50_cents"),
          element_at(col("ex"), 3).as("p75_cents"),
          col("n_rows"),
          (relErrOk(1) && relErrOk(2) && relErrOk(3)).as("within_2pct"))
        .orderBy(col("o_orderstatus"))
    },

    QueryDef("agg_rollup", Some(s"""
      SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
             count(*) AS n_orders, $revenueSql AS revenue
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region_name, nation_name""")) { (s, d) =>
      // partial aggregate BELOW the join (a pushdown Catalyst doesn't
      // do): lineitem collapses to one exact-decimal partial per
      // orderkey before the fact⋈fact join — measured ~35% faster at
      // sf0.1, and the join input shrinks by the lineitem:orders fanout
      // (4x here, more at 100 TB). Exact-decimal partials re-sum to the
      // identical total in any order, so the oracle is unchanged.
      val li = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("prev"),
          count(lit(1)).as("pn"))
      li.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("pn")).as("n_orders"), sum(col("prev")).cast("double").as("revenue"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("n_orders"), col("revenue"))
        .orderBy(col("region_name"), col("nation_name"))
    },

    QueryDef("agg_cube", Some(s"""
      SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
             count(*) AS n, ${dsumSql("l_quantity")} AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls""")) { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("*")).as("rf"),
          coalesce(col("l_linestatus"), lit("*")).as("ls"), col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    },

    QueryDef("agg_grouping_sets", Some("""
      SELECT coalesce(o_orderstatus, '*') AS st, coalesce(o_orderpriority, '*') AS prio, count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY st, prio""")) { (s, d) =>
      // scoped view name: rebinding "orders" would clobber the session
      // catalog a user set up via GraftCatalog.registerAll
      t(s, d, "orders").createOrReplaceTempView("graft_q_gsets_orders")
      s.sql("""
        SELECT coalesce(o_orderstatus, '*') AS st, coalesce(o_orderpriority, '*') AS prio, count(*) AS n
        FROM graft_q_gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY st, prio""")
    },

    // ───── joins ─────
    QueryDef("q03_top_orders", Some(s"""
      SELECT o_orderkey, o_orderdate, o_orderpriority, $revenueSql AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey LIMIT 10""")) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    QueryDef("q05_region_revenue", Some(s"""
      SELECT r_name, n_name, $revenueSql AS revenue
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01"))
          && col("o_orderdate") < to_timestamp(lit("1999-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(revenue.as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    QueryDef("join_left_agg", Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(money(col("o_totalprice"))), lit(0)).cast("double").as("total_spend"))
        .orderBy(col("c_custkey"))
    },

    QueryDef("join_semi", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    /** Anti-join recut (round 15) so the oracle gate is
      * discriminative: every sf0.01 customer has at least one order,
      * so the unfiltered NOT EXISTS returned 0 rows and its hash gate
      * proved only "both engines return the empty set". Anti-joining
      * against the 'F'-status subset yields 71 rows at sf0.01;
      * QueriesSpec floor-asserts non-emptiness. */
    QueryDef("join_anti", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    QueryDef("join_right", Some("""
      SELECT c_custkey, c_name, o_orderkey
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'P'
      ORDER BY c_custkey, o_orderkey NULLS FIRST""")) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    QueryDef("join_full", Some("""
      SELECT coalesce(c.k, s.k) AS nationkey,
             coalesce(c.n, 0) AS n_customers, coalesce(s.n, 0) AS n_suppliers
      FROM (SELECT c_nationkey AS k, count(*) AS n FROM customer GROUP BY 1) c
      FULL JOIN (SELECT s_nationkey AS k, count(*) AS n FROM supplier GROUP BY 1) s ON c.k = s.k
      ORDER BY nationkey""")) { (s, d) =>
      val cn = t(s, d, "customer").groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
      val sn = t(s, d, "supplier").groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
      cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
        .orderBy(col("nationkey"))
    },

    /** As-of join, the scale-path formulation: tag + union + one
      * window pass (single shuffle/sort on user), instead of the
      * quadratic range-join. Order key (t, kind, o_orderkey) makes
      * "latest order at or before the event, max orderkey on date ties"
      * deterministic. */
    QueryDef("join_asof", Some("""
      SELECT e.event_id, e.user_id,
        (SELECT o_orderkey FROM orders o
          WHERE o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
          ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) AS asof_orderkey,
        (SELECT max(o_orderdate) FROM orders o
          WHERE o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)) AS asof_orderdate
      FROM events e ORDER BY event_id""")) { (s, d) =>
      val o = t(s, d, "orders").select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("t"), lit(0).as("kind"),
        col("o_orderkey"), col("o_orderdate"), lit(null).cast("long").as("event_id"))
      val e = Tables.events(s, d).select(
        col("user_id"), col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("o_orderkey"), lit(null).cast("timestamp").as("o_orderdate"),
        col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("o_orderkey").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("asof_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("asof_orderkey"), col("asof_orderdate"))
        .orderBy(col("event_id"))
    },

    // ───── window functions ─────
    QueryDef("win_rank", Some("""
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice AS price,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank() OVER w AS BIGINT) AS rk,
               CAST(dense_rank() OVER w AS BIGINT) AS drk
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn""")) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("price"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    QueryDef("win_lag_gap", Some("""
      SELECT o_custkey, o_orderkey,
             CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap_days,
             CAST(date_diff('day', o_orderdate,
               lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS next_gap_days
      FROM orders ORDER BY o_custkey, o_orderkey""")) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long").as("gap_days"),
          datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate")).cast("long").as("next_gap_days"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    QueryDef("win_running", Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
      FROM orders ORDER BY o_custkey, o_orderkey""")) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // value-range frame: only expressible in SQL in both engines.
    QueryDef("win_range", Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                  RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS BIGINT) AS n_close
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("graft_q_winrange_orders")
      s.sql("""
        SELECT o_orderkey, o_orderstatus,
               CAST(count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS BIGINT) AS n_close
        FROM graft_q_winrange_orders ORDER BY o_orderkey""")
    },

    // ───── sort / limit / set ops ─────
    QueryDef("topk_orders", Some("""
      SELECT o_orderkey, o_totalprice AS price
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))   // TakeOrderedAndProject
        .limit(25)
    },

    QueryDef("setop_union", Some("""
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .union(t(s, d, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey")))
        .distinct()
        .orderBy(col("c_custkey"))
    },

    QueryDef("setop_intersect", Some("""
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .intersect(t(s, d, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("c_custkey"))
    },

    /** EXCEPT recut (round 15) for a discriminative gate: every
      * customer key appears in orders, so the unfiltered EXCEPT was
      * empty and hash-vacuous. Subtracting only the 'O'-status
      * projection leaves 49 rows at sf0.01 (a different status subset
      * than join_anti's, so the two gates stay independent);
      * QueriesSpec floor-asserts non-emptiness. */
    QueryDef("setop_except", Some("""
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY c_custkey""")) { (s, d) =>
      t(s, d, "customer").select(col("c_custkey"))
        .except(t(s, d, "orders").filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("c_custkey"))
    },

    QueryDef("setop_except_all", Some("""
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
      ORDER BY l_orderkey""")) { (s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "N").select(col("l_orderkey"))
        .exceptAll(t(s, d, "lineitem").filter(col("l_linestatus") === "F").select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    },

    QueryDef("setop_intersect_all", Some("""
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT ALL
      SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
      ORDER BY l_orderkey""")) { (s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "N").select(col("l_orderkey"))
        .intersectAll(t(s, d, "lineitem").filter(col("l_quantity") > 25).select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    },

    // ───── scalar function families ─────
    QueryDef("scalar_string", Some("""
      SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, substr(p_name, 1, 8) AS pre,
             CAST(length(p_name) AS BIGINT) AS len, replace(p_name, ' ', '_') AS und,
             reverse(p_type) AS rev, concat(p_brand, '#', p_type) AS tag,
             CAST(instr(p_name, 'a') AS BIGINT) AS pos
      FROM part ORDER BY p_partkey""")) { (s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 8).as("pre"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_name"), " ", "_").as("und"),
        reverse(col("p_type")).as("rev"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("tag"),
        instr(col("p_name"), "a").cast("long").as("pos"))
        .orderBy(col("p_partkey"))
    },

    QueryDef("scalar_math", Some("""
      SELECT l_orderkey, l_linenumber,
             round(sqrt(l_extendedprice), 6) AS sq, round(ln(l_extendedprice), 6) AS lg,
             round(pow(1 + l_discount, 3), 6) AS pw,
             CAST(ceil(l_quantity / 7) AS BIGINT) AS ce, CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
             round(abs(l_discount - 0.05), 6) AS ab, l_orderkey % 7 AS md
      FROM lineitem ORDER BY l_orderkey, l_linenumber""")) { (s, d) =>
      // sort FIRST, project AFTER: .orderBy below the projection both
      // samples its child (the range partitioner's extra pass would run
      // sqrt/ln/pow over every row twice) and shuffles the computed
      // columns; sorting the narrow 5-column input and projecting
      // post-shuffle runs the math once on ordered rows (Project
      // preserves ordering; the key pair is unique, so the order is
      // total). Measured 2.6 s -> 0.8 s at sf0.1.
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_discount"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(pow(lit(1) + col("l_discount"), 3), 6).as("pw"),
        ceil(col("l_quantity") / 7).cast("long").as("ce"),
        floor(col("l_quantity") / 7).cast("long").as("fl"),
        round(abs(col("l_discount") - 0.05), 6).as("ab"),
        (col("l_orderkey") % 7).as("md"))
    },

    QueryDef("scalar_conditional", Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'big'
                  WHEN o_totalprice > 150000 THEN 'mid' ELSE 'small' END AS bucket,
             coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
             CAST(o_totalprice > 300000 AS VARCHAR) AS is_big
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid").otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
        (col("o_totalprice") > 300000).cast("string").as("is_big"))
        .orderBy(col("o_orderkey"))
    },
  )
}
