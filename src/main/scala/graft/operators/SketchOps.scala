package graft.operators

import scala.collection.mutable

/** Bounded-memory stream sketches for per-partition imperative passes.
  *
  * These are the rare case the build brief's operator preference order
  * reserves `mapPartitions` for: genuinely imperative per-partition
  * state that no composition of built-ins expresses — a frequent-items
  * sketch must observe the stream one element at a time under a hard
  * memory bound. Everything AROUND the sketch (candidate union, exact
  * confirmation counts, thresholding) stays declarative DataFrame code.
  */
object SketchOps {

  /** Misra-Gries frequent-items sketch over one partition's stream
    * (Misra & Gries, "Finding repeated elements", Sci. Comp. Prog.
    * 1982; the `k`-counter generalization of Boyer-Moore majority).
    *
    * At most `k` counters are live at any moment — the memory bound
    * holds for ANY key cardinality, which is the whole point at 100 TB:
    * a straight `groupBy(key).count` shuffles every distinct key, while
    * MG surfaces a bounded candidate set with one streaming pass and no
    * shuffle at all.
    *
    * Guarantee used by the callers: every item with partition frequency
    * > n_p/(k+1) survives (each decrement step consumes k+1 stream
    * positions — the item's own plus k others — so an item exceeding
    * that budget cannot be erased). By pigeonhole, any item with GLOBAL
    * frequency > N/(k+1) exceeds n_p/(k+1) in at least one partition,
    * so the union of per-partition survivors is a superset of the
    * global heavy hitters; an exact confirmation pass then makes the
    * final answer precise, independent of sketch estimates.
    *
    * Returns surviving `(item, counter)` pairs; the counter is a lower
    * bound on the partition frequency (undercounts by at most
    * n_p/(k+1)) — callers use survival, not the value, for exactness.
    */
  def misraGries(k: Int)(it: Iterator[String]): Iterator[(String, Long)] = {
    require(k > 0, s"misraGries needs k > 0, got $k")
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters(x) = c + 1
        case None if counters.size < k => counters(x) = 1L
        case None =>
          // decrement-all, drop zeros: the classic O(1)-amortized step
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.filterInPlace((_, c) => c > 0)
      }
    }
    counters.iterator
  }
}
