package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Part-A ingestion operators of the reference, re-expressed as pure
  * `DataFrame => DataFrame` functions (SURVEY.md §2 Part A).
  *
  * The reference implements these as imperative Python over `List[Dict]`
  * batches (/root/reference/src/main.py, gcs_helper.py); here each is a
  * declarative transformation so Catalyst can fuse, prune, and push them
  * down. All are shuffle-free except [[dedupLatest]] (one shuffle on the
  * dedup key — unavoidable, and at 100 TB it should ride an existing
  * partitioning of the same key, which Spark reuses across stages).
  */
object IngestOps {

  /** A22 — CNPJ normalization: strip `.`, `/`, `-`
    * (/root/reference/src/main.py:22-23). */
  def normalizeCnpj(c: Column): Column = regexp_replace(c, "[./-]", "")

  /** A11 — deterministic partitioned path layout
    * `CNPJ_{cnpj}/{endpoint}/[{yyyyMMdd}/]response_pg{page}.json`
    * (/root/reference/src/main.py:25-31), as a column expression. */
  def storagePath(cnpj: Column, endpoint: String, page: Column, dt: Column): Column = {
    val datePart = when(dt.isNotNull, concat(date_format(dt, "yyyyMMdd"), lit("/")))
      .otherwise(lit(""))
    concat(lit("CNPJ_"), normalizeCnpj(cnpj), lit(s"/$endpoint/"), datePart,
      lit("response_pg"), page.cast("string"), lit(".json"))
  }

  /** A9 — enrichment projection: append `gcs_uri`, `ingestion_timestamp`
    * (batch-constant UTC), `source_system="VMHUB"`
    * (/root/reference/src/main.py:33-40). Narrow, codegen'd, no shuffle. */
  def enrich(df: DataFrame, gcsUri: Column): DataFrame =
    df.withColumn("gcs_uri", gcsUri)
      .withColumn("ingestion_timestamp",
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("source_system", lit("VMHUB"))

  /** A10 — success-only predicate (the reference's one row filter,
    * pushed server-side via `somenteSucesso=true`,
    * /root/reference/src/api/vmhub_client.py:113,126-131). Catalyst
    * pushes this to the parquet scan. */
  def successOnly(df: DataFrame, statusCol: String, successValue: String): DataFrame =
    df.filter(col(statusCol) === successValue)

  /** A16 — key-based latest-wins dedup, strictly stronger than the
    * reference's truncate-reload (/root/reference/src/utils/
    * bigquery_helper.py:120). Deterministic winner: greatest `orderCol`,
    * ties broken by `tiebreak` (SURVEY.md §7.5 risk 3).
    *
    * Scale: one hash shuffle on `keys`; with AQE skewed keys are split
    * automatically. Equivalent plan to `row_number()=1` but expressed as
    * max_by-style aggregation would lose the full row; window form keeps
    * whole-stage codegen for the filter.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], orderCol: String, tiebreaks: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tiebreaks).map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A7/A8 — incremental watermark recovery: max landed partition date,
    * formatted like the reference's blob-path segments
    * (/root/reference/src/utils/gcs_helper.py:203-241). At scale this is
    * a partition-listing metadata op, not a data scan; over a DataFrame
    * it is a single partial-aggregated max (map-side combine, tiny
    * shuffle). */
  def watermark(df: DataFrame, dtCol: String): DataFrame =
    df.agg(max(date_format(col(dtCol), "yyyyMMdd")).as("watermark"))

  /** A6 — daily range enumeration: `sequence` + `explode` replaces the
    * reference's generator of [00:00, 23:59.999999] windows
    * (/root/reference/src/config/endpoints.py:19-34). We standardize on
    * half-open [d, d+1) day windows (SURVEY.md §1.4). */
  def dailyRanges(df: DataFrame, dtCol: String): DataFrame =
    df.agg(min(to_date(col(dtCol))).as("lo"), max(to_date(col(dtCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .select(col("day"),
        col("day").cast("timestamp").as("day_start"),
        date_add(col("day"), 1).cast("timestamp").as("day_end"))

  /** A24 — date scalar family used throughout the reference
    * (strftime('%Y%m%d'), ISO-8601+Z, now-2y; /root/reference/src/main.py:
    * 28,35,204). */
  def dtCompact(c: Column): Column = date_format(c, "yyyyMMdd")
  def dtIso(c: Column): Column    = date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
  def parseCompact(c: Column): Column = to_date(c, "yyyyMMdd")

  /** A12 — NDJSON serialization of the full row (one JSON object per
    * line; /root/reference/src/utils/gcs_helper.py:45-49). Spark's JSON
    * sink IS newline-delimited; this exposes the per-row serialized form
    * as a column for when the payload must travel inside another table. */
  def toNdjson(df: DataFrame): DataFrame =
    df.withColumn("json", to_json(struct(df.columns.toIndexedSeq.map(col): _*)))

  /** A11+A17 — partitioned sink: Hive-style `dt=yyyyMMdd` directories
    * replace the reference's hand-built paths; the within-partition
    * sort on `clusterCols` mirrors BigQuery clustering
    * (bigquery_helper.py:88-92). Overwrite of matching partitions only
    * (dynamic) replaces truncate-reload.
    *
    * File-count control: without a shuffle on dt, every input task
    * opens a writer for every dt it touches — tasks × days files (a
    * small-file catastrophe at 100 TB). A RANGE repartition on
    * (dt, cluster...) bounds both ends: files per day ≈ the range
    * partitions covering that day (not tasks × days), while a huge
    * single day still spreads across many tasks by cluster-key range
    * (a hash repartition on dt alone would funnel a whole day through
    * one task). The in-task (dt, cluster...) sort feeds the sequential
    * per-dt writer and delivers the clustering; range partitioning is
    * already dt-contiguous. The partition count is pinned to the
    * session's shuffle-partition setting because AQE would coalesce
    * the tiny post-shuffle stage into ONE task and serialize every
    * file write (measured 17 s → 6 s on the a17 fixture slice). */
  def writePartitioned(df: DataFrame, path: String, dtCol: String, clusterCols: Seq[String]): Unit =
    df.withColumn("dt", date_format(col(dtCol), "yyyyMMdd"))
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        ("dt" +: clusterCols).map(col): _*)
      .sortWithinPartitions(("dt" +: clusterCols).map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(path)

  /** Read a `dt=yyyyMMdd`-partitioned parquet layout (as written by
    * [[writePartitioned]]) with `dt` typed STRING instead of the
    * inferred INT. Why it matters: dt predicates then compare strings
    * directly — yyyyMMdd orders identically as string or int — and
    * reach the scan as `PartitionFilters`; a cast wrapped around an
    * inferred-int dt would defeat partition pruning, turning a
    * few-directory read into a full-layout scan at 100 TB. The schema
    * probe reads parquet footers + the partition listing only
    * (metadata, not data). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructType}
    val discovered = spark.read.parquet(path).schema
    val schema = StructType(discovered.map(f =>
      if (f.name == "dt") f.copy(dataType = StringType) else f))
    spark.read.schema(schema).parquet(path)
  }

  /** Partition-scoped CDC MERGE — the 100 TB form of a full-table
    * upsert rewrite. Applies `changes` (updates for matched `keys`,
    * inserts for new ones; every row names its target partition in a
    * `dt` column) to the dt-partitioned layout at `path` by rewriting
    * ONLY the partitions the changes touch: a partition-pruned base
    * read ([[readPartitioned]] + isin — `PartitionFilters` in the
    * plan), one full-outer join with changes-win coalesce, and a
    * dynamic partition overwrite. Untouched partitions' files are
    * never read or rewritten (file-level proof in
    * IncrementalPipelineSpec) — the reference's per-day idempotent
    * reload semantic (/root/reference/src/main.py:253-267).
    *
    * Merge identity is **(keys, dt)** — a row's partition is part of
    * its identity, as in any partition-scoped store. Moving a key
    * across partitions is therefore an explicit delete (old dt) +
    * upsert (new dt) pair, which makes both partitions touched; a
    * keys-only join would instead half-apply the move, duplicating
    * the key into the new partition while the unread old partition
    * kept it.
    *
    * The touched-dt list is collected driver-side: that is PARTITION
    * METADATA — O(days touched), the same scale as the reference's
    * per-day loop — never row data, and `maxTouched` bounds it loudly.
    * `changes` is materialized once (localCheckpoint) before the
    * touched list is derived, so a nondeterministic source cannot
    * yield different dts at merge time than the list that scoped the
    * rewrite. Returns the touched dts for audit.
    *
    * `opCol` enables full CDC semantics: when set, change rows whose
    * `opCol` value is `"delete"` REMOVE the matching (keys, dt) row
    * (a delete of an absent key is a no-op); every other op value
    * upserts. A touched partition whose rows are ALL deleted is
    * removed from the layout (dynamic overwrite alone cannot clear a
    * partition that no written row names). Without `opCol` the batch
    * is upsert-only, and a batch that still carries an `op` column is
    * rejected — silently upserting delete rows would resurrect them.
    *
    * Contract limits, stated loudly:
    *  - ONE change row per (keys, dt). Duplicates would fan out
    *    through the full-outer join and write duplicate rows with a
    *    nondeterministic column mix, so they are rejected up front
    *    (one bounded extra aggregate over the pinned change batch) —
    *    pre-dedupe with [[dedupLatest]] if the feed can repeat keys.
    *  - Update columns merge as coalesce(change, base): a change row
    *    can never set a data column to NULL — the base value silently
    *    survives. This diverges from SQL MERGE's UPDATE SET (which
    *    overwrites with NULL); a CDC feed that must null out a column
    *    should model it as a delete+insert pair (full-row replace)
    *    rather than a partial update. */
  def mergePartitioned(spark: SparkSession, path: String, changes: DataFrame,
      keys: Seq[String], maxTouched: Int = 1000,
      opCol: Option[String] = None): Seq[String] = {
    require(opCol.isDefined || !changes.columns.exists(_.equalsIgnoreCase("op")),
      "mergePartitioned: change batch carries an 'op' column but opCol is not set — " +
        "pass opCol = Some(\"op\") (or drop the column) so delete rows are not upserted")
    // pin the batch: touched-dt derivation and the merge join must see
    // the SAME rows even if `changes` reads a live/nondeterministic
    // source
    val pinned = changes.localCheckpoint(true)
    val touched = pinned.select(col("dt").cast("string")).distinct()
      .collect().map { r =>
        require(!r.isNullAt(0), "mergePartitioned: change row with null dt")
        r.getString(0)
      }.sorted.toSeq
    require(touched.nonEmpty, "mergePartitioned: empty change batch")
    require(touched.size <= maxTouched,
      s"mergePartitioned: ${touched.size} touched partitions exceed maxTouched=$maxTouched")
    // (keys, dt) uniqueness guard — see the contract in the scaladoc
    val dupes = pinned.groupBy((keys :+ "dt").map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupes == 0,
      s"mergePartitioned: change batch has multiple rows per (${keys.mkString(", ")}, dt) — " +
        "dedupe the batch (e.g. IngestOps.dedupLatest) before merging; a silent " +
        "precedence pick here would be nondeterministic")
    val base = readPartitioned(spark, path).filter(col("dt").isin(touched: _*))
    val joinCols = keys :+ "dt"
    val dataCols = base.columns.filterNot(joinCols.contains).toSeq
    val opTag = opCol.map(c => coalesce(col(c).cast("string"), lit("upsert")).as("__c_op"))
    val chg = pinned.select(keys.map(col) ++ Seq(col("dt").cast("string").as("dt")) ++
      dataCols.map(c => col(c).cast(base.schema(c).dataType).as(s"__c_$c")) ++
      opTag: _*)
    val joined = base.join(chg, joinCols, "full")
    // delete rows vanish; unmatched deletes (base side null) are
    // no-ops and vanish with them
    val alive = if (opCol.isDefined) joined.filter(
      col("__c_op").isNull || col("__c_op") =!= "delete") else joined
    val merged = alive
      .select(joinCols.map(col) ++
        dataCols.map(c => coalesce(col(s"__c_$c"), col(c)).as(c)): _*)
    // cut lineage before writing back into the read path (Spark refuses
    // to overwrite a path it is also reading from); the checkpoint
    // materializes only the touched partitions' merged rows
    val out = merged.localCheckpoint(true)
    out.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt").parquet(path)
    // fully-deleted partitions: dynamic overwrite wrote nothing for
    // them, so their pre-merge files would silently survive — remove
    // those directories explicitly (driver-side, bounded by touched)
    val surviving = out.select(col("dt")).distinct()
      .collect().map(_.getString(0)).toSet
    if (surviving.size < touched.size) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (touched.toSet -- surviving).foreach { dt =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"dt=$dt"), true)
      }
    }
    touched
  }

  /** Small-file compaction — the table-maintenance pass every
    * long-lived partitioned layout needs: streaming/CDC appends leave
    * each partition fragmented into many small files, and at 100 TB
    * the per-file open/footer cost dominates the scan. Rewrites the
    * layout at `src` into `dst` with at most `filesPerPartition`
    * files per partition value: rows repartition on
    * (partCol, input-split id mod k), so one partition value lands in
    * at most k writer tasks — k=1 gives one file per partition, while
    * k>1 keeps a huge (skewed) partition's rewrite parallel instead
    * of funneling it through a single task; size k by partition bytes
    * / target file size. The bucket column only places rows (content
    * is bucket-independent), and the within-task sort on `sortCols`
    * preserves clustering through the rewrite. Content parity and the
    * file-count bound are asserted in MaintenanceSpec. */
  def compactPartitions(spark: SparkSession, src: String, dst: String,
      partCol: String = "dt", filesPerPartition: Int = 1,
      sortCols: Seq[String] = Nil): Unit = {
    require(filesPerPartition >= 1, "compactPartitions: filesPerPartition must be >= 1")
    spark.read.parquet(src)
      .withColumn("__bucket", pmod(spark_partition_id(), lit(filesPerPartition)))
      .repartition(col(partCol), col("__bucket"))
      .sortWithinPartitions((partCol +: sortCols).map(col): _*)
      .drop("__bucket")
      .write.mode("overwrite").partitionBy(partCol).parquet(dst)
  }

  /** Z-order clustering write — multi-dimensional data layout for a
    * lake scanned by predicates on SEVERAL columns: a plain sort
    * clusters only its leading column, while interleaving the bits of
    * all `zCols` puts rows close in EVERY dimension into the same
    * files, so parquet min/max file stats prune scans on any of them.
    * Each column is min/max-normalized to a `bits`-wide integer (the
    * min/max agg is one metadata-sized driver read — 2 scalars per
    * column, never row data), the scaled values interleave bit-by-bit
    * into one long z-value, and a RANGE repartition + in-task sort on
    * that z lays rows down the curve across exactly `files` files.
    * All arithmetic is codegen'd builtins (shift/and/or) — the z
    * column costs one projection and is dropped before the write.
    * Numeric and date/timestamp columns only (cast to long first).
    * NULL handling: an empty input or an all-NULL z column has no
    * min/max and is rejected loudly (naming the column) rather than
    * NPE-ing; per-row NULLs in a z column scale to 0, i.e. sort to
    * the start of the curve — they cluster together, which is what a
    * stats-pruned scan wants (`col IS NULL` predicates hit few files).
    * Per-file range narrowing on every dimension is measured in
    * MaintenanceSpec. */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    require(zCols.nonEmpty && zCols.size * bits <= 63,
      s"zorderWrite: ${zCols.size} cols x $bits bits must fit a long")
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // date/timestamp → epoch numbers (no direct temporal→double cast in
    // ANSI Spark; NTZ pivots through the UTC session timezone)
    def numeric(c: String): Column = df.schema(c).dataType match {
      case DateType         => unix_date(col(c)).cast("double")
      case TimestampType    => unix_seconds(col(c)).cast("double")
      case TimestampNTZType => unix_seconds(col(c).cast("timestamp")).cast("double")
      case _                => col(c).cast("double")
    }
    val aggs = zCols.flatMap(c => Seq(min(numeric(c)), max(numeric(c))))
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bits) - 1
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      require(!statsRow.isNullAt(2 * i) && !statsRow.isNullAt(2 * i + 1),
        s"zorderWrite: column '$c' has no non-null values (empty input or all-NULL " +
          "column) — cannot derive a z-order range for it")
      val (lo, hi) = (statsRow.getDouble(2 * i), statsRow.getDouble(2 * i + 1))
      // degenerate (constant) column → every row scales to 0
      if (hi <= lo) lit(0L)
      // coalesce: per-row NULLs scale to 0 (start of curve, see doc)
      else coalesce(least(lit(top), floor((numeric(c) - lit(lo)) /
        lit(hi - lo) * lit(top.toDouble + 1)).cast("long")), lit(0L))
    }
    val k = zCols.size
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** `part-NNNNN-<job uuid>-…` — Spark stamps every file of one write
    * job with the same UUID; the UUID group IS the write generation. */
  private val PartFileRe =
    "^part-\\d+-([0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12})".r

  /** One write generation of a snapshot-managed layout: the files one
    * write job committed, stamped with that job's part-file UUID.
    * `committedAtMs` is the group's newest file mtime — the commit
    * ordinal in a layout with no transaction log. */
  final case class Generation(uuid: String, committedAtMs: Long,
      files: Seq[String], bytes: Long)

  /** All write generations under `path`, newest first (mtime desc,
    * uuid tie-break). Pure file metadata — no row data touched. */
  def listGenerations(spark: SparkSession, path: String): Seq[Generation] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val (dirs, files) = fs.listStatus(p).partition(_.isDirectory)
      files.toSeq ++ dirs.toSeq
        .filterNot(d => d.getPath.getName == "_temporary" ||
          d.getPath.getName.startsWith(".spark-staging"))
        .flatMap(d => walk(d.getPath))
    }
    walk(new Path(path))
      .flatMap(f => PartFileRe.findFirstMatchIn(f.getPath.getName).map(m => (m.group(1), f)))
      .groupBy(_._1)
      .map { case (uuid, grp) =>
        Generation(uuid, grp.map(_._2.getModificationTime).max,
          grp.map(_._2.getPath.toString).sorted, grp.map(_._2.getLen).sum)
      }
      .toSeq.sortBy(g => (-g.committedAtMs, g.uuid))
  }

  /** Snapshot-managed write: append a NEW full-table generation next to
    * the previous ones instead of overwriting them — the poor-man's
    * lakehouse commit (Delta/Iceberg semantics with the filesystem as
    * the log: the part-file UUID is the commit id, mtime the ordinal).
    * Readers MUST resolve through [[snapshotRead]] (a plain
    * `read.parquet` would see every generation's rows at once);
    * [[vacuumOrphans]] is the matching retention GC — non-live
    * generations older than the horizon are reclaimed, which is
    * exactly "time travel works within the retention window". Each
    * snapshotWrite must carry the FULL table state (generations are
    * snapshots, not deltas) — the reference's truncate-reload
    * (/root/reference/src/main.py:253-267) is this same contract minus
    * the history. */
  def snapshotWrite(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Time-travel read: the table as of `versionsBack` commits ago
    * (0 = current). Only the chosen generation's files are scanned;
    * `basePath` keeps partition columns alive. Fails loudly when the
    * history doesn't reach that far (vacuumed or never written). */
  def snapshotRead(spark: SparkSession, path: String, versionsBack: Int = 0): DataFrame = {
    require(versionsBack >= 0, "snapshotRead: versionsBack must be >= 0")
    val gens = listGenerations(spark, path)
    require(gens.size > versionsBack,
      s"snapshotRead: only ${gens.size} generation(s) at $path — " +
        s"cannot go back $versionsBack (vacuumed or never written)")
    val g = gens(versionsBack)
    spark.read.option("basePath", path).parquet(g.files: _*)
  }

  /** What [[vacuumOrphans]] swept: per-category counts plus reclaimed
    * bytes, for the audit log every GC needs. */
  final case class VacuumStats(filesKept: Long, filesDeleted: Long,
      dirsDeleted: Long, bytesReclaimed: Long) {
    def merge(o: VacuumStats): VacuumStats = VacuumStats(
      filesKept + o.filesKept, filesDeleted + o.filesDeleted,
      dirsDeleted + o.dirsDeleted, bytesReclaimed + o.bytesReclaimed)
  }

  /** Orphan-file GC — the retention pass the maintenance family
    * (compact / analyze / z-order) was missing: a long-lived layout
    * accumulates files no read will ever use — committer debris from
    * aborted writes (`_temporary/`, `.spark-staging-*`), stray temp
    * files, and write generations superseded by an overwrite rewrite
    * that died between delete and commit. The last class is the
    * dangerous one: a stale visible `part-*` file is silently READ
    * alongside the live generation and duplicates its rows — GC here
    * is a correctness repair, not just space reclamation. The
    * reference sidesteps all of this only because truncate-reload
    * rewrites everything every run (/root/reference/src/main.py:
    * 253-267, src/utils/bigquery_helper.py:120).
    *
    * Live-set rule (no transaction log to consult): this engine's
    * layouts are OVERWRITE-managed ([[writePartitioned]],
    * [[mergePartitioned]], [[compactPartitions]]) — exactly one write
    * generation is live per leaf directory. Spark stamps every file of
    * one write job with the same UUID (`part-NNNNN-<uuid>...`), so
    * within a directory the generation containing the newest file is
    * live; `part-*` files of other generations, hidden debris (except
    * `_SUCCESS`), non-part strays, and committer temp dirs are
    * orphans. Append-managed layouts (legitimately mixed UUIDs) must
    * NOT be vacuumed with this rule — that contract is the doc's
    * loudest line.
    *
    * Retention (`olderThanMs`): an orphan is only deleted once older
    * than the horizon — a recent "orphan" may be an in-flight
    * concurrent write's not-yet-committed output, and deleting it
    * would corrupt that writer. Mirrors lakehouse VACUUM retention
    * semantics. The live generation is never deleted regardless of
    * age. Do NOT run vacuum concurrently with a write to the same
    * layout: without a commit log, a concurrent writer's newer files
    * are indistinguishable from the live generation, and the rule
    * would demote the real one — schedule GC in the same maintenance
    * window as compact/z-order.
    *
    * Scale shape: pure file METADATA — listings and deletes, never row
    * data; per-directory cost is O(files in dir) names. Partition
    * directories sweep in parallel on a bounded driver pool
    * ([[ParallelOps.runIsolated]] — the reference's own fan-out
    * shape); at object-store scale the same per-directory sweep
    * distributes as one task per partition dir. Returns audit stats. */
  def vacuumOrphans(spark: SparkSession, path: String,
      olderThanMs: Long = 7L * 24 * 3600 * 1000L,
      parallelism: Int = 8): VacuumStats = {
    import org.apache.hadoop.fs.Path
    require(olderThanMs >= 0, "vacuumOrphans: retention must be >= 0")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val partRe = PartFileRe
    def isCommitterTemp(name: String) =
      name == "_temporary" || name.startsWith(".spark-staging")
    val zero = VacuumStats(0, 0, 0, 0)
    def dropTempDir(d: org.apache.hadoop.fs.FileStatus): VacuumStats =
      if (d.getModificationTime < cutoff) {
        val sz = fs.getContentSummary(d.getPath).getLength
        if (fs.delete(d.getPath, true)) VacuumStats(0, 0, 1, sz) else zero
      } else zero   // recent: possibly an in-flight write — retained
    def sweepFiles(files: Array[org.apache.hadoop.fs.FileStatus]): VacuumStats = {
      // live generation: the part-file UUID group holding the newest file
      val parts = files.filter(f => partRe.findFirstIn(f.getPath.getName).isDefined)
      val liveUuid: Option[String] =
        if (parts.isEmpty) None
        else Some(parts.groupBy(f => partRe.findFirstMatchIn(f.getPath.getName).get.group(1))
          .maxBy(_._2.map(_.getModificationTime).max)._1)
      files.foldLeft(zero) { (acc, f) =>
        val name = f.getPath.getName
        val uuid = partRe.findFirstMatchIn(name).map(_.group(1))
        val live = uuid.exists(liveUuid.contains) || name == "_SUCCESS"
        if (live) acc.merge(VacuumStats(1, 0, 0, 0))
        else if (f.getModificationTime < cutoff && fs.delete(f.getPath, false))
          acc.merge(VacuumStats(0, 1, 0, f.getLen))
        else acc.merge(VacuumStats(1, 0, 0, 0))   // young orphan: retained
      }
    }
    def sweep(dir: Path): VacuumStats = {
      val (subdirs, files) = fs.listStatus(dir).partition(_.isDirectory)
      val fromDirs = subdirs.foldLeft(zero) { (acc, d) =>
        if (isCommitterTemp(d.getPath.getName)) acc.merge(dropTempDir(d))
        else acc.merge(sweep(d.getPath))
      }
      fromDirs.merge(sweepFiles(files))
    }
    // top level fans out per subdirectory (the dt= partition dirs);
    // root-level files (unpartitioned layouts, _SUCCESS) use the same
    // generation rule
    val (topDirs, topFiles) = fs.listStatus(new Path(path)).partition(_.isDirectory)
    val (tempDirs, dataDirs) = topDirs.partition(d => isCommitterTemp(d.getPath.getName))
    val tempStats = tempDirs.foldLeft(zero)((acc, d) => acc.merge(dropTempDir(d)))
    ParallelOps.runIsolated(
      dataDirs.toSeq.map(d => () => sweep(d.getPath)), parallelism = parallelism)
      .map(_.get)   // a failed sweep is a failed vacuum — surface it
      .foldLeft(tempStats)(_ merge _)
      .merge(sweepFiles(topFiles))
  }
}
