package graft

import graft.operators.IngestOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based operator laws (SURVEY.md §5 strategy 2). ScalaCheck
  * generators build small random tables (fixed seed per iteration →
  * reproducible); properties assert algebraic laws the operators must
  * hold for ANY data, not just the fixtures. (Plain Gen sampling, no
  * scalatestplus bridge — it is not in the offline dependency cache.)
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.chooseNum(1L, 8L)
    day <- Gen.chooseNum(1, 28)
    v <- Gen.stringOfN(4, Gen.alphaChar)
  } yield (k, f"2024-01-$day%02d", v)

  private val tableGen = Gen.nonEmptyListOf(rowGen)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("dedupLatest: idempotent, one row per key, winner is max (order, tiebreak)") {
    samples(tableGen, 8).foreach { rows =>
      val df = rows.toDF("k", "d", "v").withColumn("d", to_timestamp(col("d")))
      val once = IngestOps.dedupLatest(df, Seq("k"), "d", Seq("v"))
      val twice = IngestOps.dedupLatest(once, Seq("k"), "d", Seq("v"))
      val got = once.select("k", "d", "v").as[(Long, java.sql.Timestamp, String)]
        .collect().map(r => r._1 -> (r._2.getTime, r._3)).toMap
      val expected = rows
        .map { case (k, d, v) => (k, (java.sql.Timestamp.valueOf(d + " 00:00:00").getTime, v)) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      assert(got === expected, s"input: $rows")
      assert(twice.collect().toSet === once.collect().toSet)
    }
  }

  test("union of page-slices equals the whole table (A3/A14 reassembly law)") {
    samples(Gen.zip(tableGen, Gen.chooseNum(1, 5)), 8).foreach { case (rows, pageSize) =>
      val df = rows.zipWithIndex.map { case ((k, d, v), i) => (i.toLong, k, d, v) }
        .toDF("id", "k", "d", "v")
      val pages = (0 until rows.length by pageSize).map(off =>
        df.filter(col("id") >= off && col("id") < off + pageSize))
      val reassembled = pages.reduce(_ unionByName _)
      assert(reassembled.count() === df.count())
      assert(reassembled.except(df).count() === 0)
      assert(df.except(reassembled).count() === 0)
    }
  }

  test("yyyyMMdd format/parse round-trips (A24 law)") {
    val days = samples(Gen.chooseNum(0, 20000), 12)
    val df = days.toDF("ed").select(expr("date_add(DATE '1970-01-01', ed)").as("d"))
    val broken = df.select(IngestOps.parseCompact(IngestOps.dtCompact(col("d"))).as("r"), col("d"))
      .filter(col("r") =!= col("d")).count()
    assert(broken === 0L)
  }

  test("enrich preserves input columns and row count (A9 law)") {
    samples(tableGen, 6).foreach { rows =>
      val df = rows.toDF("k", "d", "v")
      val out = IngestOps.enrich(df, lit("gs://x"))
      assert(out.count() === df.count())
      assert(out.select("k", "d", "v").except(df).count() === 0)
    }
  }

  test("mergePartitioned laws: replay-idempotent; disjoint batches commute") {
    // generator: a base table plus a change batch over overlapping
    // keys/partitions (unique (k, dt) per side — the merge identity)
    val kd = Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(1, 3))
    val batchGen = Gen.nonEmptyListOf(Gen.zip(kd, Gen.chooseNum(0, 999)))
      .map(_.distinctBy(_._1).map { case ((k, p), v) => (k, v.toDouble, f"2024020$p") })
    // all sinks live under one deterministic root, wiped up front —
    // repeated test runs do not accumulate orphaned temp dirs
    val propRoot = s"${sys.props("java.io.tmpdir")}/graft_test_mrg_prop"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(propRoot))
    var sinkN = 0
    samples(Gen.zip(batchGen, batchGen), 6).foreach { case (baseRows, chgRows) =>
      def freshSink(): String = {
        sinkN += 1
        val s = s"$propRoot/t$sinkN"
        baseRows.toDF("id", "v", "dt").write.mode("overwrite").partitionBy("dt").parquet(s)
        s
      }
      def state(sink: String): Set[(Long, Double, String)] =
        IngestOps.readPartitioned(spark, sink).select(col("id"), col("v"), col("dt"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      val chg = chgRows.toDF("id", "v", "dt")
      // replay idempotence: applying the same batch twice == once
      val s1 = freshSink()
      IngestOps.mergePartitioned(spark, s1, chg, Seq("id"))
      val once = state(s1)
      IngestOps.mergePartitioned(spark, s1, chg, Seq("id"))
      assert(state(s1) === once, s"replay diverged: base=$baseRows chg=$chgRows")
      // disjoint-key batches commute (order-independence law behind
      // stream_cdc_apply's out-of-order micro-batches)
      val (bA, bB) = chgRows.partition(_._1 % 2 == 0)
      if (bA.nonEmpty && bB.nonEmpty) {
        val (sAB, sBA) = (freshSink(), freshSink())
        IngestOps.mergePartitioned(spark, sAB, bA.toDF("id", "v", "dt"), Seq("id"))
        IngestOps.mergePartitioned(spark, sAB, bB.toDF("id", "v", "dt"), Seq("id"))
        IngestOps.mergePartitioned(spark, sBA, bB.toDF("id", "v", "dt"), Seq("id"))
        IngestOps.mergePartitioned(spark, sBA, bA.toDF("id", "v", "dt"), Seq("id"))
        assert(state(sAB) === state(sBA), s"batches did not commute: A=$bA B=$bB")
      }
    }
  }

  test("watermark equals max over any permutation (A7/A8 law)") {
    samples(tableGen, 6).foreach { rows =>
      val df = rows.toDF("k", "d", "v").withColumn("d", to_timestamp(col("d")))
      val shuffled = scala.util.Random.shuffle(rows).toDF("k", "d", "v")
        .withColumn("d", to_timestamp(col("d")))
      val a = IngestOps.watermark(df, "d").as[String].head()
      val b = IngestOps.watermark(shuffled, "d").as[String].head()
      assert(a === b)
      assert(a === rows.map(_._2.replace("-", "")).max)
    }
  }

  test("BandJoinBinning law: binned band join == nested loop for ANY values and band") {
    graft.plans.BandJoinBinning.install(spark)
    // values deliberately include negatives, zeros, exact multiples of
    // common widths, and near-boundary points — the floor-bucket edge
    // cases; bands are asymmetric with random widths
    val valGen = Gen.oneOf(
      Gen.chooseNum(-100.0, 100.0),
      Gen.chooseNum(-20, 20).map(_ * 0.05),      // exact bucket boundaries
      Gen.chooseNum(-1000, 1000).map(_ / 997.0)) // irrational-ish spread
    val tblGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 500L), valGen))
    val bandGen = Gen.zip(Gen.chooseNum(1, 40).map(_ * 0.01), Gen.chooseNum(1, 40).map(_ * 0.01))
    (1 to 6).foreach { i =>
      val rows = samples(tblGen, i).last.take(60)
      val (lo, hi) = samples(bandGen, i).last
      val a = rows.toDF("a_id", "a_val")
      val b = rows.map { case (k, v) => (k + 1000, v) }.toDF("b_id", "b_val")
      def q = a.join(b, col("a_val") >= col("b_val") - lo && col("a_val") <= col("b_val") + hi)
        .select(col("a_id"), col("b_id"))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(graft.plans.BandJoinBinning.Flag, "false")
      val off =
        try q.collect().map(_.toString).sorted.toSeq
        finally spark.conf.unset(graft.plans.BandJoinBinning.Flag)
      assert(on === off, s"band=(-$lo, +$hi) rows=${rows.take(8)}...")
    }
  }

  test("BPE law: relational trainer == direct Sennrich reference for ANY corpus") {
    // random {a,b}-alphabet corpora maximize run/overlap/tiebreak
    // collisions — the adversarial regime for leftmost-greedy parity.
    // The fixed "aabbaabb" rider guarantees >= 2 tokens survive to
    // round 3's selection (token count at worst halves per round), so
    // every sampled corpus trains the full 3 rounds.
    import graft.queries.TokenizerQueries
    val wordGen = Gen.chooseNum(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b')))
    val corpusGen = Gen.nonEmptyListOf(wordGen).map(ws => ws.take(8) :+ "aabbaabb")
    samples(corpusGen, 6).foreach { words =>
      val docs = Seq(words.mkString(" ")).toDF("text")
      val (sels, rFinal) = TokenizerQueries.trainChain(docs)
      val got = sels.map { s =>
        val r = s.collect().head; ((r.getString(0), r.getString(1)), r.getLong(2))
      }
      val gotSeg = rFinal.groupBy(col("sym")).agg(sum(col("wc")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val (refMerges, refVocab) = BpeReference.train(words, 3)
      assert(got === refMerges, s"corpus: $words")
      assert(gotSeg === BpeReference.segCounts(refVocab), s"corpus: $words")
    }
  }

  test("PHash: encode->decode->dHash is the identity for ARBITRARY 64-bit patterns") {
    import graft.operators.Multimodal.PHash
    val halfGen = Gen.chooseNum(0L, (1L << 32) - 1)
    val pairGen = for { lo <- halfGen; hi <- halfGen } yield (lo, hi)
    samples(pairGen, 300).foreach { case (lo, hi) =>
      // the fixture only ever realizes md5-derived patterns; the codec
      // contract must hold for EVERY pattern (all-ones rows walk the
      // brightness to the 120 floor, all-zeros to the 136 ceiling)
      assert(PHash.dHash(PHash.encodePng(lo, hi)) === ((lo, hi)),
        f"round-trip broke for lo=$lo%08x hi=$hi%08x")
    }
  }
}
