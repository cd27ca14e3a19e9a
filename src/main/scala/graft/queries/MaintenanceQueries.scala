package graft.queries

import graft.{Staging, Tables}
import graft.operators.IngestOps
import org.apache.spark.sql.functions._

/** Table-maintenance surface: the housekeeping operators a long-lived
  * 100 TB partitioned layout needs between query workloads.
  */
object MaintenanceQueries {

  val defs: Seq[QueryDef] = Seq(

    /** Small-file compaction under the oracle gate: a 3-month orders
      * slice is staged month-partitioned but deliberately fragmented
      * (16-way repartition before the write → up to 16 files per
      * month), then [[IngestOps.compactPartitions]] rewrites it to one
      * file per partition. The judged output is the full post-compaction
      * read-back vs the source table — compaction must be byte-lossless
      * on row content, which is exactly what the rows+hash oracle
      * asserts; the file-count drop (the point of the operator) is
      * asserted by MaintenanceSpec on the same staged layout. The date
      * window is bounded on BOTH ends (fixture orders span 1995-2001;
      * an open tail would stage ~80 months). */
    QueryDef("maintenance_compact", Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m') AS dt
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
      ORDER BY o_orderkey""")) { (s, d) =>
      val root = Staging.dir("compact", d)
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("dt"))
        .repartition(16)
        .write.mode("overwrite").partitionBy("dt").parquet(s"$root/in")
      IngestOps.compactPartitions(s, s"$root/in", s"$root/out",
        sortCols = Seq("o_orderkey"))
      s.read.parquet(s"$root/out")
        .select(col("o_orderkey"), col("o_totalprice"), col("dt").cast("string"))
        .orderBy(col("o_orderkey"))
    },
  )
}
