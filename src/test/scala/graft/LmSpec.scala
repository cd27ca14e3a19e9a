package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** The persisted corpus-LM lifecycle (round-15 task 5). The serve
  * oracle hash-gates values; this spec covers the contracts the
  * fixture can't: the OOV miss path and the all-OOV sentinel
  * (exercised synthetically — at sf0.001 every held-out bigram
  * happens to be in-vocabulary), plus artifact/lifecycle invariants
  * and batch≡stream agreement.
  */
class LmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("score(): OOV bigrams counted but unscored; all-OOV doc gets the -1 sentinel") {
    import spark.implicits._
    // model: only ("a","b") -> 500000 and ("b","a") -> 250000
    val model = Seq(("a", "b", 500000L), ("b", "a", 250000L))
      .toDF("w1", "w2", "p_ppm")
    val batch = Seq(
      (1L, Seq("a", "b", "a", "zz")), // bigrams: ab, ba, a-zz -> 2 scored, 1 OOV
      (2L, Seq("qq", "rr", "ss")),    // all OOV -> sentinel
      (3L, Seq("solo"))               // < 2 tokens -> no row at all
    ).toDF("doc_id", "w")
    val got = graft.queries.LmQueries.score(batch, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set(1L, 2L))
    // doc 1: mean over SCORED only = (500000 + 250000) div 2 = 375000
    assert(got(1L) === ((3L, 2L, 375000L)))
    assert(got(2L) === ((2L, 0L, -1L)))
  }

  test("lifecycle: batch roster complete, scores bounded, model artifact well-formed") {
    val rows = SparkEntry.queries("doc_lm_score_persisted")(spark, sf).collect()
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .filter("doc_id % 5 = 0 AND n >= 2")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === expected)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"doc ${r.getLong(0)}: n_scored > n_bigrams")
      val ppm = r.getLong(3)
      assert(ppm == -1L || (ppm >= 0L && ppm <= 1000000L),
        s"doc ${r.getLong(0)}: lm_ppm $ppm outside [0, 1e6] and not the sentinel")
    }
    // the trained artifact is a real parquet table keyed uniquely by
    // (w1, w2), every conditional in (0, 1e6]
    val model = spark.read.parquet(graft.queries.LmQueries.sharedLmModel(spark, sf))
    assert(model.count() === model.select("w1", "w2").distinct().count())
    assert(model.filter("p_ppm < 1 OR p_ppm > 1000000").count() === 0L)
  }

  test("streaming twin reproduces the batch serve row-for-row") {
    val batch = SparkEntry.queries("doc_lm_score_persisted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val stream = SparkEntry.queries("stream_lm_score")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stream === batch)
  }

  private def modelMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("doc_lm_update: merged counts == full-standing retrain, bit-for-bit; day-2 fold load-bearing") {
    import org.apache.spark.sql.functions.{size, sum => ssum}
    val rebuilt = modelMap(spark.read.parquet(
      graft.queries.LmQueries.sharedLmModel(spark, sf)))
    val updated = modelMap(graft.queries.LmQueries.updatedLmModel(spark, sf))
    assert(updated === rebuilt)
    // the persisted artifact carries ONLY day-1 (even doc_id) counts:
    // the day-2 fold completes the model, so the gate cannot pass on
    // a stale full-standing artifact
    val root = graft.queries.LmQueries.sharedLmStats(spark, sf, day1Only = true)
    val c1Tot = spark.read.parquet(s"$root/uni").agg(ssum(col("c1"))).head.getLong(0)
    def tokTotal(where: String): Long =
      graft.queries.SharedText.tokenized(spark, sf).filter(where)
        .agg(ssum(size(col("w")))).head.getLong(0)
    assert(c1Tot === tokTotal("doc_id % 5 <> 0 AND doc_id % 2 = 0"))
    assert(c1Tot < tokTotal("doc_id % 5 <> 0"), "fixture has no odd standing docs - merge vacuous")
  }

  test("doc_lm_forget: subtracted counts == survivor retrain, bit-for-bit; tombstones load-bearing") {
    import graft.queries.LmQueries.{ForgetMod, ForgetRes}
    // direct third implementation: survivor counts in plain Scala
    val surv = graft.queries.SharedText.tokenized(spark, sf)
      .filter(s"doc_id % 5 <> 0 AND doc_id % $ForgetMod <> $ForgetRes")
      .select("w").collect().map(_.getSeq[String](0))
    val c1 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    surv.foreach { w =>
      w.foreach(t => c1(t) += 1)
      w.sliding(2).filter(_.size == 2).foreach(p => c2((p(0), p(1))) += 1)
    }
    val want = c2.map { case ((w1, w2), n) => (w1, w2) -> (n * 1000000L) / c1(w1) }.toMap
    val got = modelMap(graft.queries.LmQueries.forgottenLmModel(spark, sf))
    assert(got === want)
    // load-bearing: forgetting moved the model (and not vacuously —
    // the tombstone slice is non-empty)
    val full = modelMap(spark.read.parquet(
      graft.queries.LmQueries.sharedLmModel(spark, sf)))
    assert(got !== full, "forget left the model unchanged - tombstones not load-bearing")
    val nTomb = graft.queries.SharedText.tokenized(spark, sf)
      .filter(s"doc_id % 5 <> 0 AND doc_id % $ForgetMod = $ForgetRes").count()
    assert(nTomb > 0, "fixture has no tombstone docs - forget vacuous")
  }

  test("doc_lm_compact: log-and-compact == the eager roll's model, row for row; every delta non-empty") {
    import graft.queries.LmQueries.{ForgetMod, ForgetRes}
    val compacted = modelMap(spark.read.parquet(
      graft.queries.LmQueries.compactedLmModelPath(spark, sf)))
    val eager = modelMap(graft.queries.LmQueries.forgottenLmModel(spark, sf))
    assert(compacted === eager,
      "compacting the delta log diverged from the eager read-modify-write roll")
    // and both moved the model (the forget spec proves eager is
    // load-bearing; transitively so is the compaction)
    val full = modelMap(spark.read.parquet(
      graft.queries.LmQueries.sharedLmModel(spark, sf)))
    assert(compacted !== full)
    // non-vacuity of the LOG itself: all four delta batches are
    // non-empty, so the compaction genuinely folded four appends
    Seq(1L, 11L, 21L, 31L).foreach { res =>
      val n = spark.read.parquet(s"$sf/documents.parquet")
        .filter(s"doc_id % 5 <> 0 AND doc_id % ${4 * ForgetMod} = $res").count()
      assert(n > 0, s"delta batch %40=$res is empty - the 4-append claim is vacuous")
    }
    assert(ForgetRes === 1L, "delta residues assume ForgetRes = 1")
  }

  test("stream_lm_forget: online subtraction reproduces the batch forget row-for-row") {
    import graft.queries.LmQueries.{ForgetMod, ForgetRes}
    val batch = SparkEntry.queries("doc_lm_forget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val stream = SparkEntry.queries("stream_lm_forget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stream === batch)
    // the micro-batch split is load-bearing: BOTH halves of the
    // tombstone slice are non-empty, so the final version genuinely
    // composed two subtractions
    def half(res: Long): Long = spark.read.parquet(s"$sf/documents.parquet")
      .filter(s"doc_id % 5 <> 0 AND doc_id % ${2 * ForgetMod} = $res").count()
    assert(half(ForgetRes) > 0 && half(ForgetMod + ForgetRes) > 0,
      "a tombstone micro-batch is empty - the composition claim is vacuous")
  }
}
