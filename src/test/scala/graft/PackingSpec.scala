package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, size}

/** Best-fit packing differentials (round-15 task 4).
  *
  * Three independent implementations must agree on every pack:
  * the judged query (histogram bulk-FFD + rank-window slot join),
  * the DuckDB oracle (per-doc recursive-CTE FFD — checked by the
  * driver's hash gate), and this spec's direct Scala per-doc FFD.
  * Plus the operator's reason to exist: measured padding strictly
  * below the whole-doc concatenate-and-chop baseline (next-fit in
  * doc_id order — a pack closes when the next doc doesn't fit).
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001
  private val B = 256L

  /** (lang, doc_id, n) rows of the fixture, n >= 1, via the engine's
    * own tokenizer so the spec replays the judged length contract. */
  private lazy val docs: Seq[(String, Long, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** Direct per-doc FFD — the third implementation: docs in
    * (n DESC, doc_id) order, each into the first pack that fits. */
  private def ffdDirect(ds: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val packs = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])] // (filled, ids)
    ds.sortBy { case (id, n) => (-n, id) }.foreach { case (id, n) =>
      val i = packs.indexWhere { case (fill, _) => fill + n <= B }
      if (i < 0) packs += ((n, Seq(id)))
      else packs(i) = (packs(i)._1 + n, packs(i)._2 :+ id)
    }
    packs.toSeq.zipWithIndex.map { case ((fill, ids), p) =>
      (p.toLong, ids.length.toLong, fill, ids.min)
    }
  }

  test("judged packs match a direct per-doc FFD replay pack-for-pack") {
    val judged = SparkEntry.queries("doc_pack_bestfit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val expected = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      ffdDirect(ds.map(d => (d._2, d._3))).map { case (p, nd, fill, first) =>
        (lang, p) -> (nd, fill, B - fill, first)
      }
    }
    assert(judged.nonEmpty)
    assert(judged === expected)
  }

  test("packing is a partition: every doc in exactly one pack, totals within budget") {
    val judged = SparkEntry.queries("doc_pack_bestfit")(spark, sf).collect()
    val nDocs = judged.map(_.getLong(2)).sum
    val nTokens = judged.map(_.getLong(3)).sum
    assert(nDocs === docs.length.toLong)
    assert(nTokens === docs.map(_._3).sum)
    judged.foreach { r =>
      // fixture docs are all shorter than the budget, so no overflow
      // singleton packs: fill <= B and padding = B - fill >= 0
      assert(r.getLong(3) <= B, s"pack ${r.getString(0)}/${r.getLong(1)} overfilled")
      assert(r.getLong(4) === B - r.getLong(3))
    }
  }

  test("measured padding strictly below the whole-doc concatenate-and-chop baseline") {
    // baseline: next-fit in doc_id order per lang — concatenate whole
    // docs, close the pack when the next doc would cross the budget
    val baselinePad = docs.groupBy(_._1).map { case (_, ds) =>
      val packs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = 0L
      ds.sortBy(_._2).foreach { case (_, _, n) =>
        if (cur + n > B) { packs += cur; cur = 0L }
        cur += n
      }
      if (cur > 0) packs += cur
      packs.map(B - _).sum
    }.sum
    val judgedPad = SparkEntry.queries("doc_pack_bestfit")(spark, sf).collect()
      .map(_.getLong(4)).sum
    assert(judgedPad < baselinePad,
      s"best-fit padding $judgedPad not below chop baseline $baselinePad")
  }

  test("ffdSolve handles the degenerate classes: budget-sized and over-budget docs") {
    import graft.queries.PackingQueries.ffdSolve
    // doc of exactly B, doc over B (singleton overflow pack), smalls fill after
    val slots = ffdSolve("x", Seq((300L, 1L), (256L, 1L), (40L, 7L)))
    // over-budget doc: own pack 0; 256-doc: own pack 1; 40s: 6 per pack
    val byPack = slots.groupBy(_.pack)
    assert(byPack(0L).map(s => s.n -> (s.hi - s.lo + 1)) === Seq(300L -> 1L))
    assert(byPack(1L).map(s => s.n -> (s.hi - s.lo + 1)) === Seq(256L -> 1L))
    assert(byPack(2L).map(s => s.n -> (s.hi - s.lo + 1)) === Seq(40L -> 6L))
    assert(byPack(3L).map(s => s.n -> (s.hi - s.lo + 1)) === Seq(40L -> 1L))
  }
}
