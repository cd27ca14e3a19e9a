package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality bounds for the approximate near-dup pipeline on labeled
  * synthetic docs: near-duplicates must collide in at least one LSH
  * band and their MinHash estimate must track exact Jaccard;
  * unrelated docs must score low. */
class MinHashQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the rain " +
    "falls softly on the quiet village roofs and the river runs down to the sea"
  private val nearDup = base.replace("quiet village", "sleepy town")   // small edit
  private val unrelated = "completely different content about spark catalyst " +
    "optimizer rules partition pruning and whole stage code generation internals"

  private lazy val rows = Seq((1L, base), (2L, nearDup), (3L, unrelated))
    .toDF("doc_id", "text")
    .select(col("doc_id"), shingles(col("text"), 5).as("sh"))
    .withColumn("sig", minhashSignature(col("sh"), 32))
    .withColumn("bands", bandKeys(col("sig"), 8, 4))
    .collect()
    .map(r => r.getLong(0) -> (r.getSeq[String](1).toSet,
      r.getSeq[Long](2), r.getSeq[Int](3)))
    .toMap

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def estSim(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  test("near-duplicates collide in at least one band and estimate tracks exact Jaccard") {
    val (shA, sigA, bandsA) = rows(1L)
    val (shB, sigB, bandsB) = rows(2L)
    val exact = jaccard(shA, shB)
    assert(exact > 0.7, s"fixture sanity: near-dup pair should be similar, got $exact")
    assert(bandsA.zip(bandsB).exists { case (x, y) => x == y },
      "near-dup pair must share an LSH band bucket")
    val est = estSim(sigA, sigB)
    assert(math.abs(est - exact) < 0.25, s"est $est vs exact $exact")
  }

  test("unrelated docs score low and (typically) do not collide") {
    val (shA, sigA, _) = rows(1L)
    val (shC, sigC, _) = rows(3L)
    val exact = jaccard(shA, shC)
    assert(exact < 0.15)
    assert(estSim(sigA, sigC) < 0.3)
  }

  test("the full dedup_minhash_lsh query surfaces constructed near-dups") {
    // run the same pipeline shape as the judged query over a temp
    // parquet table to prove the end-to-end candidate generation
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash").toString
    Seq((1L, base, "en", "src", base.length.toLong),
      (2L, nearDup, "en", "src", nearDup.length.toLong),
      (3L, unrelated, "en", "src", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_minhash_lsh")(spark, dir).collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"pair (1,2) not found in ${out.toSeq}")
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("index append+recap equals rebuild-from-scratch, row for row") {
    // the maintenance invariant dedup_minhash_index_append's oracle
    // hash-gates through the probe path, asserted here directly on the
    // INDEX frames: recap(cap(standing) ∪ arrivals) == cap(standing ∪
    // arrivals) — exact because the cap keeps the lowest-200 doc_ids
    // per bucket (composition-independent), and the probe query runs
    // first so the appended artifact under test is the judged one
    val sf = TestSpark.sf0001
    SparkEntry.queries("dedup_minhash_index_append")(spark, sf).collect()
    val appended = spark.read
      .parquet(graft.Staging.dir("mhidx_appended", sf))
      .select("doc_id", "band", "bk1", "bk2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val rebuilt = graft.queries.TextQueries.rebuildAppendedIndex(spark, sf)
      .select("doc_id", "band", "bk1", "bk2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(appended.nonEmpty)
    assert(appended === rebuilt)
  }

  test("index delete: tombstones are load-bearing and can only remove hits") {
    val sf = TestSpark.sf0001
    def rowsOf(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    val full = rowsOf("dedup_minhash_incremental")
    val del = rowsOf("dedup_minhash_index_delete")
    assert(full.keySet === del.keySet)
    // deletion is monotone: no probe gains hits, and first_dup can
    // only move up (the min over a subset of live index docs)
    del.foreach { case (id, (n, fd)) =>
      assert(n <= full(id)._1, s"probe $id GAINED hits after deletion")
      assert(fd == -1L || fd % 20 != 3, s"probe $id still hit tombstoned doc $fd")
    }
    // load-bearing: the tombstone slice must actually change answers
    // (some probe's hit was a % 20 == 3 index doc)
    assert(del.exists { case (id, v) => v != full(id) },
      "tombstones changed nothing - the delete gate is vacuous at this sf")
    assert(full.exists { case (_, (_, fd)) => fd >= 0 && fd % 20 == 3 },
      "no incremental first_dup is a tombstone - weaken of the witness")
  }

  test("combined roll: tombstone fold is load-bearing inside the composition, no tombstoned witness") {
    val sf = TestSpark.sf0001
    def rowsOf(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    val roll = rowsOf("dedup_minhash_index_roll")
    val app = rowsOf("dedup_minhash_index_append")
    assert(roll.keySet === app.keySet)
    // no probe may cite a tombstoned index doc post-roll
    roll.foreach { case (id, (_, fd)) =>
      assert(fd == -1L || fd % 20 != 3, s"probe $id cites tombstoned doc $fd post-roll")
    }
    // the composition is more than append alone: dropping tombstones
    // before the re-cap changes answers (measured 12 differing probes
    // at sf0.001 / 8 at sf0.01 against the append oracle)
    assert(roll.exists { case (id, v) => v != app(id) },
      "the roll's tombstone fold changed nothing - the composition gate is vacuous")
  }

  test("stream roll == batch roll: the two rolled artifacts are frame-equal") {
    // round-18 verdict task 1's gate: the ONLINE roll (four real
    // micro-batches logging tombstones + arrivals, one fold after the
    // drain) must land on the SAME artifact as the batch nightly roll
    // — not just the same probe answers. Multiset frame equality via
    // exceptAll both ways (doc_id can legitimately repeat across
    // bands; sig arrays compare element-wise).
    val sf = TestSpark.sf0001
    SparkEntry.queries("dedup_minhash_index_roll")(spark, sf).collect()
    SparkEntry.queries("stream_minhash_index_roll")(spark, sf).collect()
    val cols = Seq("doc_id", "sig", "band", "bk1", "bk2").map(col)
    val batchArt = spark.read.parquet(graft.Staging.dir("mhidx_rolled", sf))
      .select(cols: _*)
    val streamArt = spark.read.parquet(graft.Staging.dir("mhsroll", sf) + "/rolled")
      .select(cols: _*)
    assert(batchArt.count() > 0, "batch roll artifact is empty - vacuous gate")
    assert(streamArt.exceptAll(batchArt).count() == 0 &&
      batchArt.exceptAll(streamArt).count() == 0,
      "stream-rolled artifact diverged from the batch-rolled artifact")
  }

  test("recap is load-bearing: pre- and post-recap serves differ on a planted over-cap row") {
    // the compaction dedup_minhash_index_recap judges, demonstrated on
    // the planted bucket: pre-recap (cap standing, then filter
    // tombstones — the delete query's serve) sees only {20}; the recap
    // (filter tombstones, then re-cap — the recapped artifact's rule)
    // re-admits the cap-evicted doc 30. Doc 30 IS the planted row.
    import graft.operators.ScaleOps.capBuckets
    val standing = Seq((10L, 0, 1L, 1L), (20L, 0, 1L, 1L), (30L, 0, 1L, 1L))
      .toDF("doc_id", "band", "bk1", "bk2")
    val tombstones = Set(10L)
    val preRecap = capBuckets(standing, Seq("band", "bk1", "bk2"), "doc_id", cap = 2)
      .filter(!col("doc_id").isInCollection(tombstones))
      .collect().map(_.getLong(0)).toSet
    val postRecap = capBuckets(
        standing.filter(!col("doc_id").isInCollection(tombstones)),
        Seq("band", "bk1", "bk2"), "doc_id", cap = 2)
      .collect().map(_.getLong(0)).toSet
    assert(preRecap === Set(20L) && postRecap === Set(20L, 30L),
      "the recap did not re-admit the evicted member - not load-bearing")
    // judged-query agreement at the fixture: the recap serve can only
    // ADD hits relative to the tombstone serve (cap(A) \ T ⊆ cap(A \ T)
    // per bucket: surviving members' ranks only drop), and still never
    // returns a tombstone
    val sf = TestSpark.sf0001
    def rowsOf(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    val del = rowsOf("dedup_minhash_index_delete")
    val recap = rowsOf("dedup_minhash_index_recap")
    assert(del.keySet === recap.keySet)
    recap.foreach { case (id, (n, fd)) =>
      assert(n >= del(id)._1, s"probe $id LOST a hit after the recap")
      assert(fd == -1L || fd % 20 != 3, s"probe $id hit tombstoned doc $fd post-recap")
    }
  }

  test("over-cap bucket: tombstone-serve hits are a strict subset of a rebuild's") {
    // the divergence dedup_minhash_index_delete's scaladoc documents,
    // demonstrated concretely: a bucket capped at 2 evicts doc 30;
    // deleting kept doc 10 cannot resurrect it, while a rebuild over
    // (standing - tombstones) re-admits it — so tombstone-serve hits
    // form a STRICT subset (under-reporting, never phantom hits)
    import graft.operators.ScaleOps.capBuckets
    val standing = Seq((10L, 0, 1L, 1L), (20L, 0, 1L, 1L), (30L, 0, 1L, 1L))
      .toDF("doc_id", "band", "bk1", "bk2")
    val capped = capBuckets(standing, Seq("band", "bk1", "bk2"), "doc_id", cap = 2)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet === Set(10L, 20L))
    val tombstones = Set(10L)
    val tombServe = capped.collect().map(_.getLong(0)).filterNot(tombstones).toSet
    val rebuild = capBuckets(
        standing.filter(!col("doc_id").isInCollection(tombstones)),
        Seq("band", "bk1", "bk2"), "doc_id", cap = 2)
      .collect().map(_.getLong(0)).toSet
    assert(tombServe === Set(20L) && rebuild === Set(20L, 30L))
    assert(tombServe.subsetOf(rebuild) && tombServe != rebuild)
    // and the judged fixtures DO exercise the over-cap regime, which
    // is why the query's oracle gates cap-then-delete, not rebuild
    val maxBucket = graft.queries.TextQueries.standingMaxBucket(spark, TestSpark.sf0001)
    info(s"largest standing bucket at sf0.001: $maxBucket (cap 200)")
    assert(maxBucket > 200)
  }
}
