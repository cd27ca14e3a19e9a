package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for the unigram-LM tokenizer (round-13): a third,
  * plain-Scala implementation of the identical hard-EM algorithm —
  * brute-force segmentation enumeration, no Spark, no SQL — must agree
  * with the engine's min-plus path squaring on the trained vocabulary
  * AND the per-doc tokenize counts. The DuckDB oracle is the second
  * implementation; three independent algorithms (squaring, recursive
  * enumeration, direct recursion) agreeing pins the semantics.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private val MaxPiece = 4
  private val SeedMulti = 40
  private val Caps = Seq(24, 16)

  /** Best segmentation of `word` under `vocab` scores: minimize piece
    * count, then maximize summed score, then lexicographically least
    * cut sequence — by direct recursion over all decompositions. */
  private def bestSeg(word: String, vocab: Map[String, Long]): List[String] = {
    case class Path(np: Int, sc: Long, cuts: List[Int], pieces: List[String])
    def all(pos: Int): List[Path] =
      if (pos == word.length) List(Path(0, 0L, Nil, Nil))
      else (1 to math.min(MaxPiece, word.length - pos)).toList.flatMap { l =>
        val p = word.substring(pos, pos + l)
        vocab.get(p).toList.flatMap { c =>
          all(pos + l).map(t => Path(t.np + 1, t.sc + c, (pos + l) :: t.cuts, p :: t.pieces))
        }
      }
    val fixedWidth = (cs: List[Int]) => cs.map(c => f"$c%02d").mkString
    all(0).minBy(p => (p.np, -p.sc, fixedWidth(p.cuts)))(
      Ordering.Tuple3(Ordering.Int, Ordering.Long, Ordering.String)).pieces
  }

  /** The full hard-EM chain in plain Scala: seed, then per cap —
    * segment, recount, prune. Returns the final (piece -> usage). */
  private def train(wfreq: Map[String, Long]): Map[String, Long] = {
    val subc = wfreq.toSeq.flatMap { case (w, wc) =>
      for (i <- 0 until w.length; l <- 1 to math.min(MaxPiece, w.length - i))
        yield (w.substring(i, i + l), wc)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val chars = subc.keySet.filter(_.length == 1)
    val seedMulti = subc.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(SeedMulti).map(_._1)
    var vocab: Map[String, Long] =
      (chars.toSeq ++ seedMulti).map(p => p -> subc(p)).toMap
    Caps.foreach { cap =>
      val usage = wfreq.toSeq.flatMap { case (w, wc) =>
        bestSeg(w, vocab).map(p => (p, wc))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val multiNext = usage.toSeq.filter(_._1.length >= 2)
        .sortBy { case (p, c) => (-c, p) }.take(cap)
      vocab = (chars.toSeq.map(c => c -> usage.getOrElse(c, 0L)) ++ multiNext).toMap
    }
    vocab
  }

  private lazy val wfreq: Map[String, Long] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("text_unigram_train matches a direct Scala hard-EM implementation exactly") {
    val direct = train(wfreq)
    val engine = SparkEntry.queries("text_unigram_train")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(engine.nonEmpty)
    // piece -> usage agree as SETS (rank re-derivable from the order)
    assert(engine.map(e => e._1 -> e._3).toMap === direct)
    // rank is the (usage desc, piece) total order, dense from 1
    val expected = direct.toSeq.sortBy { case (p, c) => (-c, p) }.map(_._1)
    assert(engine.sortBy(_._4).map(_._1).toSeq === expected)
    assert(engine.map(_._4).sorted.toSeq === (1L to engine.length).toSeq)
    engine.foreach { case (p, n, _, _) => assert(n === p.length.toLong) }
    // single-char coverage: every char of every word survives pruning
    val chars = wfreq.keys.flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(engine.map(_._1).toSet))
  }

  test("text_unigram_tokenize matches direct per-word piece counts on every doc") {
    val vocab = train(wfreq)
    val nSub: Map[String, Int] = wfreq.keys.map(w => w -> bestSeg(w, vocab).length).toMap
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val engine = SparkEntry.queries("text_unigram_tokenize")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = docs.collect { case (id, ws) if ws.nonEmpty =>
      id -> (ws.length.toLong, ws.map(w => nSub(w).toLong).sum)
    }.toMap
    assert(engine === expected)
    // pieces never exceed words; at least one word actually splits
    // (otherwise the vocabulary degenerated to whole words only)
    engine.foreach { case (id, (nw, np)) =>
      assert(np >= nw, s"doc $id: fewer pieces than words")
    }
    assert(engine.exists { case (_, (nw, np)) => np > nw },
      "no document's tokenization split any word — degenerate vocabulary")
  }
}
