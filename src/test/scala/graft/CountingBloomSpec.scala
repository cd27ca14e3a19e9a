package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, pmod}
import graft.operators.CountingBloom

/** Gates for the deletable (counting) bloom and its judged consumer
  * `dedup_bloom_seen_delete` (round 16): cell-exact add/remove
  * inversion, refused-remove atomicity, serialization round-trip,
  * distributed-build equivalence, and the load-bearing flip — a
  * forgotten re-crawl source must turn its re-crawl unseen while the
  * bit bloom provably cannot forget. */
class CountingBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("add then remove is a cell-exact inverse; refused remove mutates nothing") {
    val a = CountingBloom.sized(1000, 0.01)
    Seq("alpha", "beta", "gamma").foreach(a.add)
    val before = a.serializedBytes
    a.add("delta").remove("delta")
    assert(java.util.Arrays.equals(a.serializedBytes, before),
      "add/remove did not restore the exact cell state")
    // removing an item the filter cannot contain is refused atomically
    val err = intercept[IllegalArgumentException](a.remove("never-added-item-xyz"))
    assert(err.getMessage.contains("refusing"))
    assert(java.util.Arrays.equals(a.serializedBytes, before),
      "refused remove left partial decrements")
  }

  test("serialization round-trip preserves membership and bytes") {
    val a = CountingBloom.sized(500, 0.01)
    (1 to 100).foreach(i => a.add(s"item-$i"))
    val b = CountingBloom.readFrom(new java.io.ByteArrayInputStream(a.serializedBytes))
    assert(java.util.Arrays.equals(b.serializedBytes, a.serializedBytes))
    (1 to 100).foreach(i => assert(b.mightContain(s"item-$i")))
  }

  test("distributed treeAggregate build equals the sequential build, cell for cell") {
    import spark.implicits._
    val items = (1 to 500).map(i => s"fp-$i")
    val seq = CountingBloom.sized(500, 0.01)
    items.foreach(seq.add)
    val dist = CountingBloom.build(items.toDS().repartition(8), 500, 0.01)
    assert(java.util.Arrays.equals(dist.serializedBytes, seq.serializedBytes),
      "partition-local builds + element-wise merge diverged from sequential insertion")
  }

  test("distributed forget roll is exact: subtract(full, tombs) == rebuild(survivors), byte for byte") {
    // the persisted cb_live.bin IS subtract(full, tomb-bloom) since
    // round 17 — gate it against a from-scratch distributed rebuild
    // over the survivor fps under the SAME (n, fpp) sizing
    val dir = graft.queries.TextQueries5.sharedCountingBloomIndex(spark, sf)
    val live = CountingBloom.readFrom(
      new java.io.FileInputStream(new java.io.File(dir, "cb_live.bin")))
    val standing = graft.queries.TextQueries5.bloomStanding(spark, sf)
      .filter(col("fp").isNotNull)
    val n = graft.queries.TextQueries5.bloomExpectedItems(spark, sf)
    // multiset rebuild (every survivor occurrence), matching the
    // builder — the identity build(standing) − build(tombs) ==
    // build(survivors) is a group fact over multisets, so this gate
    // holds for ANY corpus, shared fingerprints included
    val rebuilt = CountingBloom.build(
      standing.filter(pmod(col("doc_id"), lit(50L)) =!= 1)
        .select(col("fp"))
        .as(org.apache.spark.sql.Encoders.STRING),
      n, graft.queries.TextQueries5.BloomFpp)
    assert(java.util.Arrays.equals(live.serializedBytes, rebuilt.serializedBytes),
      "cell-wise subtract diverged from the survivor rebuild")
  }

  test("aggregate refusal: subtracting a bloom containing a never-added item throws and mutates nothing") {
    val a = CountingBloom.sized(1000, 0.01)
    Seq("alpha", "beta", "gamma").foreach(a.add)
    val before = a.serializedBytes
    val bad = CountingBloom.sized(1000, 0.01)
    bad.add("alpha"); bad.add("never-added-item-xyz")
    val err = intercept[IllegalArgumentException](a.subtractInPlace(bad))
    assert(err.getMessage.contains("refusing"))
    assert(java.util.Arrays.equals(a.serializedBytes, before),
      "refused subtract left partial decrements")
    // sizing mismatch is refused up front, untouched likewise
    intercept[IllegalArgumentException](
      a.subtractInPlace(CountingBloom.sized(50, 0.1)))
    assert(java.util.Arrays.equals(a.serializedBytes, before))
    // the legitimate half alone subtracts cleanly and exactly
    val good = CountingBloom.sized(1000, 0.01); good.add("alpha")
    a.subtractInPlace(good)
    val survivors = CountingBloom.sized(1000, 0.01)
    Seq("beta", "gamma").foreach(survivors.add)
    assert(java.util.Arrays.equals(a.serializedBytes, survivors.serializedBytes),
      "subtract of a singleton bloom diverged from the survivor build")
  }

  test("online forget roll: merged per-batch tombstone blooms subtract to the one-shot cb_live bytes") {
    // round-18: stream == batch at the artifact level for the bloom
    // family — the per-batch logged blooms sum (cell-wise group
    // addition) to the one-shot tombstone bloom, so subtracting the
    // merge from cb_full must land on cb_live.bin BIT-for-bit; a
    // dropped batch, a double-merged log, or any sizing drift breaks
    // the byte equality
    SparkEntry.queries("stream_bloom_forget")(spark, sf).collect()
    val streamLive = CountingBloom.readFrom(new java.io.FileInputStream(
      new java.io.File(graft.Staging.dir("cbsforget", sf), "cb_live_stream.bin")))
    val dir = graft.queries.TextQueries5.sharedCountingBloomIndex(spark, sf)
    val oneShot = CountingBloom.readFrom(new java.io.FileInputStream(
      new java.io.File(dir, "cb_live.bin")))
    assert(java.util.Arrays.equals(streamLive.serializedBytes, oneShot.serializedBytes),
      "stream-rolled live bloom diverged from the one-shot subtract artifact")
  }

  test("persisted lifecycle: live filter forgets tombstones; bit bloom provably cannot") {
    val dir = graft.queries.TextQueries5.sharedCountingBloomIndex(spark, sf)
    def read(name: String) = CountingBloom.readFrom(
      new java.io.FileInputStream(new java.io.File(dir, name)))
    val live = read("cb_live.bin")
    val standing = graft.queries.TextQueries5.bloomStanding(spark, sf)
      .filter(col("fp").isNotNull)
    val tombFps = standing.filter(pmod(col("doc_id"), lit(50L)) === 1)
      .select("fp").distinct().collect().map(_.getString(0))
    val liveFps = standing.filter(pmod(col("doc_id"), lit(50L)) =!= 1)
      .select("fp").distinct().collect().map(_.getString(0))
    assert(tombFps.nonEmpty && liveFps.nonEmpty)
    // hard guarantee: zero false negatives for the surviving set
    liveFps.foreach(fp => assert(live.mightContain(fp), s"live fp $fp went negative"))
    // deletion is visible: tombstones are (mostly - fpp allows rare
    // still-positives from unrelated cell overlap) gone from the
    // counting filter...
    val stillPositive = tombFps.count(live.mightContain)
    assert(stillPositive <= math.max(1, tombFps.length / 10),
      s"$stillPositive of ${tombFps.length} tombstones still positive - decrement broken")
    // ...while the bit bloom (current.bloom) still reports every one:
    // bit-OR cannot forget, which is WHY this family exists
    val bitBloom = graft.queries.TextQueries5.readBloom(
      graft.queries.TextQueries5.sharedBloomIndex(spark, sf), "current.bloom")
    tombFps.foreach(fp => assert(bitBloom.mightContainString(fp)))
  }

  test("judged flip: forgetting a re-crawl source turns exactly its re-crawls unseen") {
    val before = SparkEntry.queries("dedup_bloom_seen")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val after = SparkEntry.queries("dedup_bloom_seen_delete")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(before.keySet === after.keySet)
    val flipped = before.keySet.filter(id => before(id) && !after(id))
    val sources = flipped.map(_ - 10000000000L)
    // tombstones are the % 50 == 1 re-crawl sources: every flip must
    // trace to one, and at least one flip must occur (load-bearing)
    assert(flipped.nonEmpty, "deletion changed no judged answer - vacuous")
    assert(sources.forall(s => s % 50 == 1), s"unexpected flips from sources $sources")
    // the % 50 == 26-source re-crawls survive as seen
    assert(after.exists { case (id, seen) =>
      seen && id > 10000000000L && (id - 10000000000L) % 50 == 26 })
    // deletion can only remove seen-ness, never add it
    assert(before.keySet.forall(id => !after(id) || before(id)))
  }
}
