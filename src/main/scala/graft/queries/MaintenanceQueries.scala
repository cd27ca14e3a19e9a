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

    /** Orphan-file GC under the oracle gate. A month-partitioned orders
      * slice is staged, then three classes of garbage are planted the
      * way real failures leave them: (1) a SUPERSEDED write generation —
      * a copy of a live part file under a different job UUID with an
      * old mtime, exactly what an overwrite that died between delete
      * and commit leaves behind; (2) committer debris (`_temporary/`
      * with an orphaned part file inside); (3) a stray `.tmp` upload.
      * Class (1) makes this gate SHARP: the stale file is visible to
      * every read, so without the vacuum the judged read-back would
      * return its rows twice and hash-fail. [[IngestOps.vacuumOrphans]]
      * (24 h retention; planted garbage is backdated 48 h) must delete
      * all three while leaving every live file untouched — the judged
      * output is the post-vacuum read-back vs the source slice, and
      * MaintenanceSpec asserts the file-level story (orphans gone, live
      * files' paths+mtimes identical, a RECENT orphan survives
      * retention). */
    QueryDef("maintenance_vacuum", Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m') AS dt
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      ORDER BY o_orderkey""")) { (s, d) =>
      import org.apache.hadoop.fs.{FileUtil, Path}
      val root = Staging.dir("vacuum", d)
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("dt"))
        .write.mode("overwrite").partitionBy("dt").parquet(s"$root/t")
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new Path(root).getFileSystem(conf)
      val old = System.currentTimeMillis() - 48L * 3600 * 1000
      val dtDir = new Path(s"$root/t/dt=1996-01")
      val live = fs.listStatus(dtDir).map(_.getPath)
        .filter(_.getName.startsWith("part-")).head
      // (1) superseded generation — visible, duplicates rows until GC'd
      val stale = new Path(dtDir,
        "part-00000-00000000-dead-beef-0000-000000000000-c000.snappy.parquet")
      FileUtil.copy(fs, live, fs, stale, false, conf)
      fs.setTimes(stale, old, -1)
      // (2) aborted-write committer debris
      val tmpTask = new Path(s"$root/t/_temporary/0/task")
      fs.mkdirs(tmpTask)
      FileUtil.copy(fs, live, fs, new Path(tmpTask,
        "part-00000-11111111-dead-beef-0000-000000000000-c000.snappy.parquet"), false, conf)
      fs.setTimes(new Path(s"$root/t/_temporary"), old, -1)
      // (3) stray temp upload
      val stray = new Path(dtDir, "upload.tmp")
      fs.create(stray).close()
      fs.setTimes(stray, old, -1)
      IngestOps.vacuumOrphans(s, s"$root/t", olderThanMs = 24L * 3600 * 1000)
      s.read.parquet(s"$root/t")
        .select(col("o_orderkey"), col("o_totalprice"), col("dt").cast("string"))
        .orderBy(col("o_orderkey"))
    },

    /** ANALYZE-style table statistics: per-column row/null/NDV counts
      * and min/max — the stats a cost-based optimizer (and a data
      * engineer's sanity check) wants for every table in the lake.
      * NDV is EXACT here for oracle parity — the approximate twin is
      * `agg_approx_distinct`'s HLL, which is what you'd run at 100 TB
      * when 2 % error is fine. Plan shape: see the inline comment —
      * per-column pruned pipelines beat the one-scan Expand
      * multi-distinct 8x, and shuffle distinct values instead of
      * N-times-replicated rows. */
    QueryDef("maintenance_analyze", Some("""
      SELECT 'l_partkey' AS col_name, count(*) AS n_rows,
             count(*) - count(l_partkey) AS n_nulls,
             count(DISTINCT l_partkey) AS ndv,
             CAST(min(l_partkey) AS VARCHAR) AS min_s, CAST(max(l_partkey) AS VARCHAR) AS max_s
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag),
             CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
             count(DISTINCT l_shipdate),
             CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
      FROM lineitem
      ORDER BY col_name""")) { (s, d) =>
      // One column-pruned two-level pipeline PER COLUMN, unioned — not
      // the single-scan multi-distinct form. Spark plans N exact
      // distincts in one agg via Expand: every row replicated N times
      // and shuffled on (gid, value) — measured 3.4 s here. Per-column
      // pipelines read the same total bytes from columnar storage
      // (each scan decodes exactly one column), map-side combine to
      // the distinct-value frame, and finish on that small frame:
      // 0.4 s, and at 100 TB the shuffle carries distinct values per
      // column instead of N full row replicas. The null group rides
      // the value frame, so n_rows/n_nulls/ndv/min/max all come from
      // the one pipeline (SQL count(DISTINCT)/min/max ignore NULL;
      // sum-of-counts restores the total).
      val li = Tables.lineitem(s, d)
      val per = Seq("l_partkey", "l_returnflag", "l_shipdate").map { c =>
        li.select(col(c))
          .groupBy(col(c).as("v"))
          .agg(count(lit(1)).as("cnt"))
          .agg(lit(c).as("col_name"),
            sum(col("cnt")).as("n_rows"),
            coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
            count(when(col("v").isNotNull, 1)).as("ndv"),
            min(col("v")).cast("string").as("min_s"),
            max(col("v")).cast("string").as("max_s"))
      }
      per.reduce(_ unionAll _).orderBy(col("col_name"))
    },

    /** Z-order clustered rewrite under the oracle gate: orders laid
      * down a 2-D z-curve over (o_custkey, o_orderdate) via
      * [[IngestOps.zorderWrite]], so parquet min/max file stats prune
      * scans filtered on EITHER column — the layout a lake wants when
      * no single sort key serves every query. The z-value only places
      * rows (content is placement-independent), which is exactly what
      * the rows+hash oracle asserts on the full read-back; the
      * per-file range narrowing on both dimensions — the point of the
      * curve — is measured by MaintenanceSpec on the same staged
      * layout. */
    QueryDef("maintenance_zorder", Some("""
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR) AS od, o_totalprice
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
      val root = Staging.dir("zorder", d)
      IngestOps.zorderWrite(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice")),
        root, Seq("o_custkey", "o_orderdate"), files = 8)
      s.read.parquet(root)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("string").as("od"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    /** Schema-evolution read — the lake norm: a column added mid-stream
      * means old files lack it, and the table read must still present
      * ONE schema with nulls backfilled. Two batches are staged with
      * drifted schemas (odd custkeys written BEFORE c_acctbal existed,
      * even custkeys after), then a single mergeSchema read unifies
      * them. At 100 TB mergeSchema's footer sampling is the metadata
      * cost — data files are untouched; the per-file projection adapts
      * at scan time (old files never materialize the missing column).
      * The oracle reconstructs the same drift from the source table. */
    QueryDef("schema_evolution", Some("""
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 2 = 0 THEN c_acctbal END AS c_acctbal
      FROM customer ORDER BY c_custkey""")) { (s, d) =>
      val root = Staging.dir("evolve", d)
      val c = Tables.customer(s, d)
      c.filter(pmod(col("c_custkey"), lit(2)) === 1)
        .select(col("c_custkey"), col("c_name"))
        .write.mode("overwrite").parquet(s"$root/b1")
      c.filter(pmod(col("c_custkey"), lit(2)) === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.mode("overwrite").parquet(s"$root/b2")
      s.read.option("mergeSchema", "true").parquet(s"$root/b1", s"$root/b2")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    /** Incremental view maintenance — keeping a rollup fresh WITHOUT
      * recomputing history: the stored state is the partial-aggregate
      * form of the view (count + exact decimal sum per month, both
      * algebraic — they merge by addition), a delta batch aggregates
      * alone, and state ⊕ delta re-aggregates to the new view. The
      * cutover lands MID-month (1999-01-15), so the boundary month
      * exists in BOTH state and delta and the merge is actually
      * exercised, not a disjoint union. At 100 TB the delta is a day
      * and history is never rescanned: cost is O(delta) + O(state
      * keys), the same shape Spark itself uses below every shuffle
      * (partial → final aggregate), lifted to a persisted layout. The
      * oracle proves the merged view equals the full recompute. */
    QueryDef("incremental_agg_merge", Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY 1""")) { (s, d) =>
      val root = Staging.dir("incragg", d)
      val orders = Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      def partial(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"), sum(money(col("o_totalprice"))).as("total_dec"))
      partial(orders.filter(col("o_orderdate") < "1999-01-15"))
        .write.mode("overwrite").parquet(s"$root/state")
      s.read.parquet(s"$root/state")
        .unionByName(partial(orders.filter(col("o_orderdate") >= "1999-01-15")))
        .groupBy(col("month"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("total_dec")).cast("double").as("total"))
        .orderBy(col("month"))
    },

    /** Snapshot isolation + time travel on the filesystem-as-log
      * layout ([[IngestOps.snapshotWrite]]/[[IngestOps.snapshotRead]]):
      * commit v0 (a 3-month orders slice), then commit v1 (the same
      * slice with every 1-URGENT order deleted) as a NEW generation —
      * v0's files stay on disk, exactly what Delta/Iceberg keep in
      * their logs, here keyed by the part-file job UUID with mtime as
      * the commit ordinal. The judged output reads BOTH versions back
      * (versionsBack=1 and 0) and rolls each up per month: time travel
      * must reproduce the pre-delete totals exactly while the current
      * read shows the post-delete state — the oracle recomputes both
      * from the source table. Complements maintenance_vacuum: vacuum
      * is the retention GC that bounds how far back this read can go.
      * Staged root is reset first (the layout is append-managed, so a
      * prior run's generations would otherwise stack up). All file
      * work is metadata-only; the two version reads scan disjoint file
      * lists with dt partition pruning intact (basePath). */
    QueryDef("maintenance_time_travel", Some("""
      WITH base AS (SELECT o_orderkey, o_totalprice, o_orderpriority,
                           strftime(o_orderdate, '%Y-%m') AS dt
                    FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                      AND o_orderdate < TIMESTAMP '1995-04-01'),
      v0 AS (SELECT 'v0' AS version, dt, o_totalprice FROM base),
      v1 AS (SELECT 'v1' AS version, dt, o_totalprice FROM base
             WHERE o_orderpriority <> '1-URGENT'),
      u AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
      SELECT version, dt, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM u GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, d) =>
      val root = Staging.dir("timetravel", d)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val base = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("dt"))
      IngestOps.snapshotWrite(base.drop("o_orderpriority"), s"$root/t", Seq("dt"))
      IngestOps.snapshotWrite(
        base.filter(col("o_orderpriority") =!= "1-URGENT").drop("o_orderpriority"),
        s"$root/t", Seq("dt"))
      val v0 = IngestOps.snapshotRead(s, s"$root/t", versionsBack = 1)
        .withColumn("version", lit("v0"))
      val v1 = IngestOps.snapshotRead(s, s"$root/t", versionsBack = 0)
        .withColumn("version", lit("v1"))
      v0.unionByName(v1)
        .groupBy(col("version"), col("dt").cast("string").as("dt"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("version"), col("dt"))
    },

    /** Corrupt-object tolerance — the round-8 theme (upstream data
      * drift/damage) as a judged operator. At 100 TB a lake WILL hold
      * the occasional truncated or garbage object (failed multipart
      * upload, bit rot); a scan that dies on the first bad footer
      * can't finish a day's work. Staging plants two NON-parquet
      * garbage files (one truncated-magic-bytes, one plain text)
      * among the customer table's real part files; the read uses the
      * file-source `ignoreCorruptFiles` OPTION (per-read, not session
      * conf — the same no-bare-conf discipline as the events loader)
      * so the scan skips exactly the bad objects and returns every
      * good row. The oracle is the intact source table: rows+hash
      * prove skip-corrupt loses nothing and invents nothing.
      * MaintenanceSpec asserts the negative control (the same read
      * WITHOUT the option throws). */
    QueryDef("maintenance_corrupt_skip", Some("""
      SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer ORDER BY c_custkey""")) { (s, d) =>
      import org.apache.hadoop.fs.Path
      val root = Staging.dir("corrupt", d)
      val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal").cast("double").as("c_acctbal"))
        .repartition(4)
        .write.mode("overwrite").parquet(s"$root/t")
      // plant garbage WITH .parquet names so the file listing includes
      // them — one truncated footer (magic bytes only), one text blob
      for ((name, bytes) <- Seq(
          "part-corrupt-a.parquet" -> "PAR1".getBytes("UTF-8"),
          "part-corrupt-b.parquet" -> "this is not a parquet file".getBytes("UTF-8"))) {
        val out = fs.create(new Path(s"$root/t/$name"), true)
        out.write(bytes); out.close()
      }
      s.read.option("ignoreCorruptFiles", "true").parquet(s"$root/t")
        .orderBy(col("c_custkey"))
    },
  )
}
