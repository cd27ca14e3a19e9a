package graft.queries

import graft.Tables
import graft.operators.IngestOps
import org.apache.spark.sql.functions._

/** The minimum end-to-end slice (SURVEY.md §7.3): the reference's core
  * pattern — ingest → enrich (A9) → dedup (A16) → join → daily revenue
  * aggregate — on the orders/lineitem fixtures.
  */
object Flagship {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("daily_revenue", Some(s"""
      WITH li AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_shipdate DESC, l_quantity DESC, l_extendedprice DESC, l_discount DESC,
                     l_tax DESC, l_partkey DESC, l_suppkey DESC, l_returnflag DESC, l_linestatus DESC) AS rn
          FROM lineitem) WHERE rn = 1)
      SELECT CAST(o_orderdate AS DATE) AS order_day, l_returnflag,
             $revenueSql AS revenue, count(*) AS n_items
      FROM li JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY order_day, l_returnflag""")) { (s, d) =>
      // The fixture carries genuine duplicate (l_orderkey, l_linenumber)
      // keys, so A16's latest-wins dedup is load-bearing here; the full
      // column tiebreak makes the winner deterministic (SURVEY.md §7.5).
      val li = IngestOps.dedupLatest(
        IngestOps.enrich(Tables.lineitem(s, d), lit("gs://vmhub-data/lineitem")),
        Seq("l_orderkey", "l_linenumber"), "l_shipdate",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"))
      li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(col("o_orderdate")).as("order_day"), col("l_returnflag"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("order_day"), col("l_returnflag"))
    },
  )
}
