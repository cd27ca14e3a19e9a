package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 curation operators: exact duplicated-substring spans vs an
  * in-JVM brute-force reference, DEFLATE density bounds + monotonicity,
  * and PageRank conservation/determinism. The value-level gates are the
  * DuckDB oracles (dedup_substring_spans, graph_pagerank,
  * stream_transform_state); these specs pin the properties the oracle
  * can't see.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dedup_substring_spans matches an in-JVM brute-force reference") {
    val K = 20
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute force: count every K-gram occurrence corpus-wide, mark
    // positions whose gram occurs >1 time, merge consecutive runs.
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, text) <- docs; i <- 0 to text.length - K)
      occ.updateWith(text.substring(i, i + K))(c => Some(c.getOrElse(0) + 1))
    val expected = (for ((id, text) <- docs.toSeq) yield {
      val dupPos = (0 to text.length - K).filter(i => occ(text.substring(i, i + K)) > 1)
      // islands of consecutive positions → maximal spans (1-based)
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var run = List.empty[Int]
      def flush(): Unit = if (run.nonEmpty) {
        val s = run.last + 1; val e = run.head + K // run is reversed
        spans += ((s.toLong, e.toLong, (e - s + 1).toLong)); run = Nil
      }
      dupPos.foreach { p =>
        if (run.nonEmpty && p != run.head + 1) flush()
        run = p :: run
      }
      flush()
      spans.toList.map { case (s, e, l) => (id, s, e, l) }
    }).flatten.toSet
    val got = q("dedup_substring_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture should contain duplicated 20-grams")
  }

  test("dedup_substring_removal matches an in-JVM brute-force reference") {
    val K = 20
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, text) <- docs; i <- 0 to text.length - K)
      occ.updateWith(text.substring(i, i + K))(c => Some(c.getOrElse(0) + 1))
    // brute force: union of [i, i+K-1] coverage over duplicated starts,
    // cleaned text = chars outside the coverage
    val expected = docs.map { case (id, text) =>
      val covered = Array.fill(text.length)(false)
      for (i <- 0 to text.length - K if occ(text.substring(i, i + K)) > 1;
           j <- i until i + K) covered(j) = true
      val cleaned = text.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
      // merged regions = runs of covered positions
      var nRegions = 0L
      for (i <- covered.indices if covered(i) && (i == 0 || !covered(i - 1))) nRegions += 1
      id -> ((nRegions, covered.count(identity).toLong, cleaned))
    }
    val got = q("dedup_substring_removal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === expected.keySet)
    for ((id, exp) <- expected) assert(got(id) === exp, s"doc $id")
    assert(expected.values.exists(_._2 > 0L), "fixture should have removals")
  }

  test("doc_compression_ratio: bounds, spread, and repetition monotonicity") {
    val rows = q("doc_compression_ratio").collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val ppm = r.getLong(r.fieldIndex("ratio_ppm"))
      assert(ppm > 0L && ppm < 1200000L, s"doc ${r.getLong(0)}: ratio_ppm $ppm out of bounds")
      assert(r.getLong(r.fieldIndex("deflated_len")) > 0L)
    }
    // direct monotonicity probe on the expression itself: pure
    // repetition compresses far below high-entropy text of equal length
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val rep = "ab" * 500
    val rnd = new scala.util.Random(42)
    val noisy = Seq.fill(1000)(rnd.nextPrintableChar()).mkString
    val Seq(lenRep, lenNoisy) = Seq(rep, noisy).toDF("t")
      .select(T.deflatedLen(col("t")).as("l")).as[Long].collect().toSeq
    assert(lenRep < lenNoisy / 5,
      s"repetitive ($lenRep) should compress far below noisy ($lenNoisy)")
  }

  test("deflated_len: null semantics, SQL registration, codegen/interpreted parity") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val df = Seq(Some("hello hello hello"), None).toDF("t")
    val got = df.select(T.deflatedLen(col("t"))).collect()
    assert(got(0).getLong(0) > 0L)
    assert(got(1).isNullAt(0))
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT deflated_len('hello hello hello') AS l").as[Long].head()
    assert(viaSql === got(0).getLong(0))
    graft.operators.ConfScope.withConf(spark, Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")) {
      val interp = df.select(T.deflatedLen(col("t"))).collect()
      assert(interp(0).getLong(0) === got(0).getLong(0))
    }
  }

  test("graph_pagerank: positive ranks, near-conserved mass, deterministic rerun") {
    val rows = q("graph_pagerank").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0L))
    val total = rows.map(_._2).sum
    // truncating division drops <1 ppm per edge per iteration; mass
    // stays within a tight band of the 1e6 fixed-point budget
    assert(total <= 1000000L && total > 990000L, s"rank mass $total out of band")
    val rerun = q("graph_pagerank").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.toSeq === rerun.toSeq, "fixed-point PageRank must be bit-deterministic")
  }

  test("stream_transform_state equals the batch aggregate (cross-batch state carried)") {
    val got = q("stream_transform_state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(queries.dec2) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("curate_quality_stump: exhaustive search finds the known-optimal boundary") {
    // synthetic corpus where the label reduces to a pure token-count
    // gate: lowercase single-char words, no punctuation, no uppercase ⇒
    // quality = min(1, n_tok/200) and label=1 ⟺ n_tok > 60. The stump
    // search must place the tok_ppm 'gt' threshold exactly at the
    // boundary value (60 tokens ⇒ 300000 ppm) with zero training error.
    import spark.implicits._
    val counts = Seq(10, 40, 59, 60, 61, 62, 80, 120, 200, 250)
    val docs = counts.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), "en", "src1", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_stump").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("curate_quality_stump")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("tok_ppm", "punct_ppm", "upper_ppm", "n_chars"))
    val (dir_, thr, correct, _) = rows("tok_ppm")
    assert(dir_ === "gt" && thr === 300000L && correct === counts.size.toLong,
      s"expected the exact boundary stump, got ${rows("tok_ppm")}")
    // degenerate features (constant zero punct/upper ppm) can never
    // beat majority class
    assert(rows("punct_ppm")._3 <= counts.size.toLong)
    assert(rows.values.exists(_._4 === 1L), "exactly one global winner flagged")
  }

  test("curate_quality_stump on the fixture: winning stump has zero training error") {
    val rows = q("curate_quality_stump").collect()
    val n = Tables.documents(spark, sf).count()
    val best = rows.find(_.getLong(4) === 1L).get
    assert(best.getLong(3) === n,
      s"the learned stump should recover the quality gate exactly: $best vs $n docs")
  }

  test("doc_dsir_weights: exact ratio arithmetic on a hand-computed corpus") {
    // two-token vocab, disjoint across domains: target docs say "aa",
    // raw-only docs say "bb". T_t=4, T_r=8, V=2.
    // ratio(aa) = (4+1)*(8+2)*1e6 div ((4+1)*(4+2)) = 50e6 div 30 = 1666666
    // ratio(bb) = (0+1)*(8+2)*1e6 div ((4+1)*(4+2)) = 10e6 div 30 =  333333
    import spark.implicits._
    val docs = Seq(
      (0L, "aa aa", "en", "src1", 5L), (1L, "aa aa", "en", "src1", 5L),
      (2L, "bb bb", "de", "src1", 5L), (3L, "bb bb", "de", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("doc_dsir_weights")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(0L) === ((2L, 1666666L, 1L)) && rows(1L) === rows(0L))
    assert(rows(2L) === ((2L, 333333L, 0L)) && rows(3L) === rows(2L))
  }

  test("stream_curate_append: replays are staged, and the standing index eliminates every one") {
    val out = q("stream_curate_append").collect()
    assert(out.nonEmpty)
    // fingerprints unique in the curated store (no replay leaked)
    val fps = out.map(_.getString(1))
    assert(fps.distinct.length === fps.length, "duplicate fingerprint in curated output")
    // the staged arrival stream REALLY contained re-crawl replays —
    // otherwise the cross-batch dedup path was never exercised
    val staged = spark.read
      .parquet(s"${Staging.dir("scurate", sf)}/in").count()
    val fixture = Tables.documents(spark, sf).count()
    assert(staged > fixture, s"staging must add replays: $staged staged vs $fixture fixture docs")
    // every emitted doc passes the gate; every gated-out doc is absent
    out.foreach(r => assert(r.getDouble(2) > 0.3))
  }

  test("stream_curate_append: replaying a committed batch is a no-op (self-excluding index probe)") {
    // foreachBatch's retry contract: a batch that committed its writes
    // but crashed before the checkpoint commit is REPLAYED. Without the
    // index probe excluding the batch's own dir, the replay would find
    // its own fingerprints, anti-join everything away, and overwrite
    // the curated dir with nothing — silent loss on the retry path.
    q("stream_curate_append").collect()
    val root = Staging.dir("scurate", sf)
    def curated() = spark.read.schema("doc_id LONG, fp STRING, quality DOUBLE")
      .parquet(s"$root/curated/b*").collect().map(_.toString).sorted.toSeq
    val before = curated()
    assert(before.nonEmpty)
    val b2 = spark.read.parquet(s"$root/in/f2.parquet")
    graft.queries.CurationQueries.curateBatch(root, b2, 2L)
    assert(curated() === before, "replaying batch 2 must not change the curated store")
  }

  test("doc_dsir_weights on the fixture: target-domain docs select at a higher rate") {
    val sel = q("doc_dsir_weights").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def rate(p: Long => Boolean) = {
      val ids = langs.keys.filter(p).toSeq
      ids.map(sel).sum.toDouble / ids.size
    }
    val en = rate(id => langs(id) == "en")
    val other = rate(id => langs(id) != "en")
    assert(en > other,
      f"DSIR must prefer target-domain docs: en rate $en%.3f vs other $other%.3f")
  }

  test("curate_drift_stats: ranking order, probability bounds, and an exact TVD recompute") {
    val rows = q("curate_drift_stats").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val chi2s = rows.map(_.getLong(rows.head.fieldIndex("chi2_ppm"))).toSeq
    assert(chi2s === chi2s.sorted.reverse, "rows must arrive in chi2-descending rank order")
    val tvds = rows.map(_.getLong(rows.head.fieldIndex("tvd_ppm"))).distinct
    assert(tvds.length === 1, "tvd_ppm is a corpus-level constant")
    rows.foreach { r =>
      val p = r.getLong(r.fieldIndex("p_ppm")); val qv = r.getLong(r.fieldIndex("q_ppm"))
      assert(p >= 0 && p <= 1000000 && qv >= 1 && qv <= 1000000, s"ppm bounds: $p / $qv")
      assert(r.getLong(r.fieldIndex("chi2_ppm")) >= 0)
    }
    // exact TVD recompute in the JVM from raw token counts — the one
    // judged value the top-20 output can't self-verify
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = toks.filter(_._1 % 5 == 0).map(_._2)
    val ref = toks.filter(_._1 % 5 != 0).map(_._2)
    val vocab = toks.map(_._2).distinct
    val (tb, tr, v) = (batch.length.toLong, ref.length.toLong, vocab.length.toLong)
    val cb = batch.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cr = ref.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tvdExp = vocab.map { t =>
      val p = (cb.getOrElse(t, 0L) + 1) * 1000000L / (tb + v)
      val qq = (cr.getOrElse(t, 0L) + 1) * 1000000L / (tr + v)
      math.abs(p - qq)
    }.sum / 2
    assert(tvds.head === tvdExp, s"tvd got ${tvds.head}, recomputed $tvdExp")
  }
}
