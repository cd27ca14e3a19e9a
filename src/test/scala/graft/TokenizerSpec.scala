package graft

import graft.queries.TokenizerQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential check of the relational BPE trainer against a direct
  * in-memory Sennrich implementation — crucially on adversarial inputs
  * the documents fixture never produces: equal-symbol runs ("aaaa"),
  * where leftmost-greedy application must merge only every other
  * candidate, and overlap-counted statistics diverge from
  * non-overlapping counts. The judged queries' DuckDB oracle replays
  * the same relational algorithm; THIS spec pins that algorithm to the
  * reference semantics. */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runChain(words: Seq[String]): (Seq[(String, String, Long)], Map[String, Long]) = {
    import spark.implicits._
    val docs = Seq(words.mkString(" ")).toDF("text")
    val (sels, rFinal) = TokenizerQueries.trainChain(docs)
    val merges = sels.map { sel =>
      val r = sel.collect().head
      (r.getString(0), r.getString(1), r.getLong(2))
    }
    val segCounts = rFinal.groupBy(col("sym")).agg(sum(col("wc")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (merges, segCounts)
  }

  private def check(words: Seq[String]): Unit = {
    val (gotMerges, gotSeg) = runChain(words)
    val (refMerges, refVocab) = BpeReference.train(words, 3)
    assert(gotMerges.map(m => (m._1, m._2)) === refMerges.map(_._1),
      s"merge choices diverge on $words")
    assert(gotMerges.map(_._3) === refMerges.map(_._2),
      s"pair counts diverge on $words")
    assert(gotSeg === BpeReference.segCounts(refVocab),
      s"final segmentation diverges on $words")
  }

  test("BPE matches the reference on equal-symbol runs (leftmost-greedy, overlap counts)") {
    // 'aa' dominates: "aaaa"→[aa,aa], "aaaaa"→[aa,aa,a], "baaab"→[b,aa,a,b]
    check(Seq("aaaa", "aaaa", "aaaaa", "baaab", "aaaa"))
  }

  test("BPE matches the reference when a learned symbol chains into later merges") {
    // round 1 learns a frequent 2-gram, later rounds must pair the
    // MERGED symbol with its neighbors (multi-char sym adjacency)
    check(Seq.fill(5)("abab") ++ Seq.fill(3)("abc") ++ Seq("cab", "bca", "abcabc"))
  }

  test("BPE matches the reference under tiebreaks and mixed run/non-run corpora") {
    check(Seq("xy", "yx", "xy", "yx", "xxyy", "yyxx", "xyxy"))
  }

  test("text_bpe_tokenize: subword counts bounded by words below and characters above") {
    val tok = SparkEntry.queries("text_bpe_tokenize")(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tok.nonEmpty)
    val chars = Tables.documents(spark, TestSpark.sf0001)
      .selectExpr("doc_id", "CAST(length(text) AS LONG) AS n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    tok.foreach { case (id, (words, subs)) =>
      assert(subs >= words, s"doc $id: fewer subwords than words")
      assert(subs <= chars(id), s"doc $id: more subwords than characters")
    }
    val totalSubs = tok.values.map(_._2).sum
    // keysIterator, NOT keys: Map#keys is a Set and mapping it through
    // chars would DEDUPLICATE equal document lengths before summing
    val totalChars = tok.keysIterator.map(chars).sum
    assert(totalSubs < totalChars, "learned merges should compress the corpus overall")
  }

  test("judged BPE train output is internally consistent on the fixture") {
    val m = SparkEntry.queries("text_bpe_train")(spark, TestSpark.sf0001).collect()
    assert(m.length === 3)
    assert(m.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // merged symbol = left || right, counts positive and non-increasing
    // is NOT guaranteed across rounds (a merge can create a more
    // frequent pair), but each count is positive
    m.foreach { r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
  }
}
