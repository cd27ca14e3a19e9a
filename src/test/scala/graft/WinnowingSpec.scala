package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for doc_winnowing the value-level oracle can't see:
  * the selected set equals a direct in-JVM winnowing reference on the
  * fixture corpus, and the paper's coverage guarantee holds on planted
  * shared substrings. */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Direct Schleimer et al. winnowing: gram hashes (first 8 md5 hex
    * digits, same family as the query), window of W, min with RIGHTMOST
    * tie-break, distinct selections. */
  private def reference(text: String): Set[(Long, Long)] = {
    if (text.length < K) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (1 to text.length - K + 1).map { pos =>
      val hex = md.digest(text.substring(pos - 1, pos - 1 + K).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (pos.toLong, java.lang.Long.parseLong(hex.take(8), 16))
    }
    md.reset()
    if (hs.length < W) return Set.empty
    hs.sliding(W).map { win =>
      // min hash, rightmost position on ties
      win.minBy { case (pos, h) => (h, -pos) }
    }.map { case (pos, h) => (pos, h) }.toSet
  }

  test("winnowFingerprints equals the direct reference on the fixture corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, t) =>
      reference(t).map { case (pos, fp) => (id, pos, fp) } }.toSet
    val got = graft.queries.CurationQueries.winnowFingerprints(
        Tables.documents(spark, TestSpark.sf0001))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected,
      s"diff: missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty)
  }

  test("coverage guarantee: a shared substring of length >= W+K-1 shares a fingerprint") {
    // two otherwise-unrelated docs carrying the same 20-char run at
    // different offsets; the guarantee needs only W+K-1 = 11
    val shared = "thequickbrownfoxjump"
    val df = Seq(
      (1L, "aaaaaaaaaaaa" + shared + "zzzzzzzz"),
      (2L, "qqqqwwwweeee rrrrtttt" + shared + "bbbb")).toDF("doc_id", "text")
    val fps = graft.queries.CurationQueries.winnowFingerprints(df)
      .as[(Long, Long, Long)].collect()
    val a = fps.filter(_._1 == 1L).map(_._3).toSet
    val b = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((a intersect b).nonEmpty,
      s"planted ${shared.length}-char shared run produced no common fingerprint")
    // density: winnowing stores far fewer positions than exhaustive grams
    val nGrams1 = df.filter($"doc_id" === 1L).select(length($"text")).as[Int].head() - K + 1
    assert(fps.count(_._1 == 1L) < nGrams1,
      "winnowing must select a strict subset of gram positions")
  }
}
