package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the table-maintenance + corpus-assembly ops the
  * oracle can't see: compaction's file-count bound (the oracle proves
  * row-content parity; the POINT of the op is the file layout) and the
  * packing/decontamination invariants. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def parquetFilesPerPartition(path: String): Map[String, Int] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
  }

  test("corrupt-skip: the planted garbage kills a plain read (negative control)") {
    // the judged query stages real part files + two garbage .parquet
    // objects and reads them back with ignoreCorruptFiles — here we
    // prove the plant is live: the SAME directory WITHOUT the option
    // must fail, otherwise the judged query tests nothing
    val out = SparkEntry.queries("maintenance_corrupt_skip")(spark, sf)
    assert(out.count() == Tables.customer(spark, sf).count(),
      "skip-corrupt read lost or invented rows")
    val root = Staging.dir("corrupt", sf)
    val e = intercept[Throwable] {
      spark.read.parquet(s"$root/t").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m =>
        m.toLowerCase.contains("parquet") || m.toLowerCase.contains("footer")),
      s"expected a corrupt-footer failure, got: ${messages(e).headOption}")
  }

  test("compactPartitions: fragmented layout collapses to one file per partition, rows intact") {
    // run the judged query (it stages + compacts under Staging.dir)
    val out = SparkEntry.queries("maintenance_compact")(spark, sf)
    val n = out.count()
    assert(n > 0)
    val root = Staging.dir("compact", sf)
    val before = parquetFilesPerPartition(s"$root/in")
    val after = parquetFilesPerPartition(s"$root/out")
    assert(before.keySet === after.keySet, "compaction changed the partition set")
    assert(before.values.sum > before.size, s"staging not fragmented: $before")
    after.foreach { case (dt, files) =>
      assert(files === 1, s"$dt has $files files after compaction")
    }
    // row parity per partition (content parity is the oracle's job)
    val inRows = spark.read.parquet(s"$root/in").groupBy("dt").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val outRows = spark.read.parquet(s"$root/out").groupBy("dt").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(inRows === outRows)
  }

  test("compactPartitions: filesPerPartition > 1 bounds files while keeping a hot partition parallel") {
    val root = Staging.dir("compact_k", sf)
    Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-03-01")
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
      .repartition(16)
      .write.mode("overwrite").partitionBy("dt").parquet(s"$root/in")
    operators.IngestOps.compactPartitions(spark, s"$root/in", s"$root/out",
      filesPerPartition = 4)
    parquetFilesPerPartition(s"$root/out").foreach { case (dt, files) =>
      assert(files >= 1 && files <= 4, s"$dt has $files files, want 1..4")
    }
    assert(spark.read.parquet(s"$root/out").count() ===
      spark.read.parquet(s"$root/in").count())
  }

  test("zorderWrite: per-file ranges narrow on BOTH z dimensions") {
    // run the judged query (stages the z-ordered layout under Staging.dir)
    assert(SparkEntry.queries("maintenance_zorder")(spark, sf).count() > 0)
    val root = Staging.dir("zorder", sf)
    val global = spark.read.parquet(root)
      .agg(max("o_custkey") - min("o_custkey"),
        max(unix_seconds(col("o_orderdate").cast("timestamp"))) - min(unix_seconds(col("o_orderdate").cast("timestamp")))).head()
    val perFile = spark.read.parquet(root)
      .groupBy(input_file_name())
      .agg((max("o_custkey") - min("o_custkey")).as("ck"),
        (max(unix_seconds(col("o_orderdate").cast("timestamp"))) - min(unix_seconds(col("o_orderdate").cast("timestamp")))).as("od"))
      .agg(avg("ck"), avg("od"), count(lit(1))).head()
    assert(perFile.getLong(2) > 1, "z-order wrote a single file — nothing to measure")
    // 8 files down a 2-D z-curve: each file covers a fraction of BOTH
    // dimensions (a plain sort would leave one dimension at ~full range)
    assert(perFile.getDouble(0) < 0.65 * global.getLong(0),
      s"custkey per-file range ${perFile.getDouble(0)} vs global ${global.getLong(0)}")
    assert(perFile.getDouble(1) < 0.65 * global.getLong(1),
      s"orderdate per-file range ${perFile.getDouble(1)} vs global ${global.getLong(1)}")
  }

  test("vacuumOrphans: orphans deleted, live files untouched, retention keeps recent orphans") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val root = Staging.dir("vacuum_spec", sf)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    fs.delete(new Path(root), true)
    Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-03-01")
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM").as("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(s"$root/t")
    val dtDir = new Path(s"$root/t/dt=1996-01")
    val liveBefore = fs.listStatus(dtDir)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(f => f.getPath.toString -> f.getModificationTime).toMap
    assert(liveBefore.nonEmpty)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    val live = new Path(liveBefore.keys.head)
    // old superseded generation → must be GC'd
    val stale = new Path(dtDir,
      "part-00000-00000000-dead-beef-0000-000000000000-c000.snappy.parquet")
    FileUtil.copy(fs, live, fs, stale, false, conf)
    fs.setTimes(stale, old, -1)
    // RECENT foreign generation → retention must keep it (in-flight write)
    val recent = new Path(dtDir,
      "part-00000-22222222-dead-beef-0000-000000000000-c000.snappy.parquet")
    FileUtil.copy(fs, live, fs, recent, false, conf)
    // committer debris, old
    fs.mkdirs(new Path(s"$root/t/_temporary/0"))
    fs.create(new Path(s"$root/t/_temporary/0/x.parquet")).close()
    fs.setTimes(new Path(s"$root/t/_temporary"), old, -1)
    // stray temp upload, old
    val stray = new Path(dtDir, "upload.tmp")
    fs.create(stray).close()
    fs.setTimes(stray, old, -1)
    val stats = operators.IngestOps.vacuumOrphans(spark, s"$root/t",
      olderThanMs = 24L * 3600 * 1000)
    assert(!fs.exists(stale), "old superseded generation must be deleted")
    assert(!fs.exists(stray), "old stray temp file must be deleted")
    assert(!fs.exists(new Path(s"$root/t/_temporary")), "committer debris must be deleted")
    assert(fs.exists(recent), "retention must keep a recent orphan")
    liveBefore.foreach { case (p, mtime) =>
      assert(fs.exists(new Path(p)), s"live file deleted: $p")
      assert(fs.getFileStatus(new Path(p)).getModificationTime === mtime,
        s"live file touched: $p")
    }
    assert(stats.filesDeleted >= 2, s"stats: $stats")
    assert(stats.dirsDeleted === 1, s"stats: $stats")
    assert(stats.bytesReclaimed > 0, s"stats: $stats")
  }

  test("zorderWrite: all-NULL z column fails loudly naming the column; row NULLs survive") {
    val allNull = spark.range(10).select(col("id"), lit(null).cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      operators.IngestOps.zorderWrite(allNull, Staging.dir("zorder_null", sf),
        Seq("id", "v"), files = 2)
    }
    assert(e.getMessage.contains("'v'"), e.getMessage)
    // per-row NULLs: scaled to the curve start, never dropped
    val mixed = spark.range(100).select(col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).cast("double").as("v"))
    val out = Staging.dir("zorder_mixed", sf)
    operators.IngestOps.zorderWrite(mixed, out, Seq("id", "v"), files = 2)
    val back = spark.read.parquet(out)
    assert(back.count() === 100)
    assert(back.filter(col("v").isNull).count() === 10)
  }

  test("maintenance_analyze: stats agree with directly computed values") {
    val stats = SparkEntry.queries("maintenance_analyze")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet === Set("l_partkey", "l_returnflag", "l_shipdate"))
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    stats.values.foreach(r => assert(r.getLong(1) === n))
    assert(stats("l_returnflag").getLong(3) ===
      li.select("l_returnflag").distinct().count())
  }

  test("doc_pack_sequences: packs partition the corpus and respect the budget arithmetic") {
    import graft.functions.TextFunctions
    val packs = SparkEntry.queries("doc_pack_sequences")(spark, sf).collect()
    val totalDocs = packs.map(_.getLong(2)).sum
    val totalTokens = packs.map(_.getLong(3)).sum
    val corpus = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(TextFunctions.tokenCount(col("text")))).head()
    assert(totalDocs === corpus.getLong(0), "every doc is packed exactly once")
    assert(totalTokens === corpus.getLong(1), "token mass is conserved")
    // pack ids are dense from 0 within each lang (chop never skips a pack
    // unless one doc overflows several budgets — none at fixture sizes)
    packs.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head === 0L, s"$lang packs don't start at 0")
    }
  }

  test("doc_url_canonical: every spelling variant collapses to one canonical page") {
    val rows = SparkEntry.queries("doc_url_canonical")(spark, sf).collect()
    // 500 fixture docs / (doc_id % 100) → 100 pages × 5 spellings
    assert(rows.length === 100)
    assert(rows.forall(_.getLong(1) === 5L), "a spelling variant escaped canonicalization")
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u == u.toLowerCase && !u.contains("www.") && !u.contains(":80") &&
        !u.contains("?") && !u.contains("#") && !u.endsWith("/"), s"not canonical: $u")
    }
  }

  test("schema_evolution: pre-drift rows surface with nulls, post-drift rows keep values") {
    val rows = SparkEntry.queries("schema_evolution")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(r.isNullAt(2) === !even,
        s"custkey ${r.getLong(0)}: acctbal null=${r.isNullAt(2)}, want ${!even}")
    }
  }

  test("incremental_agg_merge: boundary month is merged from state AND delta") {
    val rows = SparkEntry.queries("incremental_agg_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val state = spark.read.parquet(s"${Staging.dir("incragg", sf)}/state")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the mid-month cutover puts 1999-01 in both inputs: the final
    // count must strictly exceed what the stored state alone carries
    assert(state.contains("1999-01") && rows.contains("1999-01"))
    assert(rows("1999-01") > state("1999-01"),
      "boundary month was not merged with the delta")
    // months fully before the cutover pass through the state unchanged
    assert(rows("1995-01") === state("1995-01"))
  }

  test("doc_decontaminate: eval docs never appear; flags match a recomputed overlap") {
    val rows = SparkEntry.queries("doc_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 50 != 0), "eval docs leaked into the output")
    assert(rows.forall(r => (r.getLong(1) > 0) === r.getBoolean(2)))
    // at least one contaminated and one clean doc at fixture scale —
    // the probe actually separates
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }

  test("snapshot lifecycle: commits stack, time travel isolates versions, vacuum bounds history") {
    import graft.operators.IngestOps
    val root = s"${Staging.dir("snaptest", sf)}/t"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    import spark.implicits._
    def snap(vals: Seq[Int]) = vals.toDF("v").withColumn("dt", lit("d1"))
    IngestOps.snapshotWrite(snap(Seq(1, 2, 3)), root, Seq("dt"))
    IngestOps.snapshotWrite(snap(Seq(1, 2)), root, Seq("dt"))
    IngestOps.snapshotWrite(snap(Seq(1, 2, 4, 5)), root, Seq("dt"))
    val gens = IngestOps.listGenerations(spark, root)
    assert(gens.size === 3)
    assert(gens.map(_.committedAtMs) === gens.map(_.committedAtMs).sorted.reverse,
      "generations must list newest first")
    def vals(back: Int) =
      IngestOps.snapshotRead(spark, root, back).select("v").as[Int].collect().sorted.toSeq
    assert(vals(0) === Seq(1, 2, 4, 5))
    assert(vals(1) === Seq(1, 2))
    assert(vals(2) === Seq(1, 2, 3))
    // partition column survives the explicit-file-list read (basePath)
    assert(IngestOps.snapshotRead(spark, root, 0).columns.contains("dt"))
    // a plain read would mix every generation's rows — the reason
    // readers must resolve through snapshotRead
    assert(spark.read.parquet(root).count() === 9)
    // vacuum = retention GC: non-live generations go, current survives
    IngestOps.vacuumOrphans(spark, root, olderThanMs = 0L)
    assert(IngestOps.listGenerations(spark, root).size === 1)
    assert(vals(0) === Seq(1, 2, 4, 5))
    assertThrows[IllegalArgumentException](IngestOps.snapshotRead(spark, root, 1))
  }
}
