package graft

import org.scalatest.funsuite.AnyFunSuite

/** Balance and integrity gates for curate_shard_writer beyond the
  * value-level oracle: the multiplicative shard hash must spread docs
  * near-uniformly, and the committed layout must cover the corpus
  * exactly once. */
class ShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("curate_shard_writer: 8 balanced shards covering the corpus exactly once") {
    val rows = SparkEntry.queries("curate_shard_writer")(spark, TestSpark.sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 7L))
    val counts = rows.map(_.getLong(1))
    assert(counts.max <= (counts.min * 12) / 10,
      s"shard skew beyond 1.2x: ${counts.mkString(",")}")
    val total = Tables.documents(spark, TestSpark.sf0001).count()
    assert(counts.sum === total, "shards must partition the corpus exactly")
  }
}
