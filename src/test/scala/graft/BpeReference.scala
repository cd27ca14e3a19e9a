package graft

/** Direct in-memory Sennrich BPE (ACL'16 `get_stats`/`merge_vocab`) —
  * the differential reference for the relational trainer in
  * [[graft.queries.TokenizerQueries]]. Shared by TokenizerSpec (fixed
  * adversarial corpora) and PropertiesSpec (random corpora law). */
object BpeReference {

  type Vocab = Map[Vector[String], Long]

  def stats(v: Vocab): Map[(String, String), Long] =
    v.toSeq.flatMap { case (syms, c) =>
      syms.iterator.zip(syms.iterator.drop(1)).map(p => p -> c).toSeq
    }.groupMapReduce(_._1)(_._2)(_ + _)

  def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merges with their pre-merge overlap counts, final vocab).
    * Selection tiebreak mirrors the judged queries: count desc, then
    * pair lexicographic. */
  def train(words: Seq[String], rounds: Int): (Seq[((String, String), Long)], Vocab) = {
    var v: Vocab = words.groupBy(identity).map { case (w, g) =>
      w.split("").toVector -> g.size.toLong
    }
    val merges = (1 to rounds).flatMap { _ =>
      val st = stats(v)
      if (st.isEmpty) None else {
        val ((a, b), c) = st.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        v = v.map { case (syms, wc) => applyMerge(syms, a, b) -> wc }
        Some((a, b) -> c)
      }
    }
    (merges, v)
  }

  /** Final segmentation reduced to frequency-weighted token counts. */
  def segCounts(v: Vocab): Map[String, Long] =
    v.toSeq.flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
}
