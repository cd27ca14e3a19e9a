package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Lifecycle gates for the persisted seen-fingerprint bloom family
  * (round-16 verdict task 2): artifact round-trip, bit-exact
  * merge-equals-rebuild, and the load-bearing-day-2 proof that the
  * maintenance merge is what keeps the probe false-negative-free.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def artifact = graft.queries.TextQueries5.sharedBloomIndex(spark, sf)
  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact, name))

  test("merge equals rebuild, bit-exactly: bytes(day1 | day2) == bytes(full)") {
    // identical (expectedItems, fpp) sizing fixes bit count and hash
    // count; insertion only ORs bits, so mergeInPlace(day1, day2) must
    // reproduce the one-shot standing-set build byte for byte — the
    // exact-maintenance invariant dedup_minhash_index_append gates for
    // the banded index, here at the serialization level
    assert(java.util.Arrays.equals(bytes("current.bloom"), bytes("full.bloom")),
      "merged artifact diverges from a from-scratch rebuild")
  }

  test("artifact round-trip: the re-read bloom has zero false negatives") {
    val bloom = graft.queries.TextQueries5.readBloom(artifact, "current.bloom")
    val standingFps = graft.queries.TextQueries5.bloomStanding(spark, sf)
      .filter(col("fp").isNotNull).select("fp").collect().map(_.getString(0))
    assert(standingFps.nonEmpty)
    standingFps.foreach(fp =>
      assert(bloom.mightContainString(fp), s"persisted bloom lost standing fp $fp"))
  }

  test("day 2 is load-bearing: re-crawl fps are day-2-only; the merge covers them") {
    // planted re-crawl sources (doc_id % 5 != 0 && % 25 == 1) have odd
    // ids, so their fps enter only the day-2 (odd-half) bloom; a probe
    // served from day1 alone would bloom-miss them (up to fpp), while
    // the merged artifact must contain every one
    val day1 = graft.queries.TextQueries5.readBloom(artifact, "day1.bloom")
    val merged = graft.queries.TextQueries5.readBloom(artifact, "current.bloom")
    val recrawlFps = graft.queries.TextQueries5.bloomStanding(spark, sf)
      .filter(pmod(col("doc_id"), lit(25L)) === 1)
      .select("fp").collect().map(_.getString(0))
    assert(recrawlFps.nonEmpty, "fixture has no planted re-crawl sources")
    recrawlFps.foreach(fp =>
      assert(merged.mightContainString(fp), s"merged bloom misses re-crawl fp $fp"))
    // at 1% fpp the chance every re-crawl fp false-positives in day1
    // is ~1e-2^n — a day1 hit on ALL of them means the split is wrong
    assert(recrawlFps.exists(fp => !day1.mightContainString(fp)),
      "every re-crawl fp already in day1 - day-2 merge is vacuous")
  }

  test("persisted query serves the same judged answer as the one-shot query") {
    val a = SparkEntry.queries("dedup_bloom_seen")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    val b = SparkEntry.queries("dedup_bloom_seen_persisted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b))
    assert(a.exists(_._2) && a.exists(!_._2), "both outcomes must be exercised")
  }
}
