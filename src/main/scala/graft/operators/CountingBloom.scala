package graft.operators

/** Counting Bloom filter (Fan, Cao, Almeida & Broder, "Summary Cache:
  * A Scalable Wide-Area Web Cache Sharing Protocol", IEEE/ACM ToN
  * 2000 §4.3) — the DELETABLE bloom: cells are counters instead of
  * bits, `add` increments k cells, `remove` decrements them, and
  * membership is "all k cells non-zero". A plain bloom's bit-OR is
  * irreversible (the honest asymmetry `sharedBloomIndex` documents);
  * the counting variant buys deletion for ~8× the space — exactly the
  * trade the right-to-be-forgotten roll of a seen-fingerprint ingest
  * gate needs between full rebuilds.
  *
  * Correctness contract: cells are plain sums of per-item increments,
  * so builds compose as a commutative GROUP over multisets —
  * build(A ⊎ B) = build(A) + build(B) cell-for-cell, and
  * build(A) − build(T) = build(A ∖ T) whenever T is a sub-multiset of
  * A. Builders therefore insert every fingerprint OCCURRENCE (not
  * distinct fps): a fp shared between a removed doc and a surviving
  * doc keeps its surviving increments, so deletion can never produce
  * a false negative for anything still present — for ANY corpus,
  * duplicates included (round-17 ADVICE closed the distinct-build
  * fixture dependence). add-then-remove is a cell-exact inverse,
  * which CountingBloomSpec asserts byte-for-byte; `remove` of a
  * never-added item is refused loudly (a zero cell) rather than
  * corrupting neighbors.
  *
  * Hashing: Kirsch–Mitzenmacher double hashing (ESA 2006) — two
  * 64-bit halves of one md5 give h1 + k·h2 mod m for all k probes,
  * one digest per item, deterministic across JVMs (the same
  * engine-portable md5 family every judged sketch here uses).
  *
  * Scale shape: cells merge by element-wise addition (a commutative
  * monoid), so the build is one `treeAggregate` over the fingerprint
  * column — per-partition locals, log-depth merges, never a
  * collect — and the serialized artifact ships to executors by one
  * explicit broadcast, the plain-bloom discipline.
  */
final class CountingBloom private (
    val numCells: Int, val numHashes: Int, val cells: Array[Int])
    extends BloomProbe {

  /** The [[BloomProbe]] face — lets the counting bloom serve through
    * the same registered `graft_might_contain` expression as the bit
    * bloom (round-17 unification). */
  override def contains(fp: String): Boolean = mightContain(fp)

  def this(numCells: Int, numHashes: Int) =
    this(numCells, numHashes, new Array[Int](numCells))

  /** (h1, h2) halves of md5(item) — one digest per item. */
  private def halves(item: String): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(md)
    (bb.getLong, bb.getLong)
  }

  private def cellOf(h1: Long, h2: Long, k: Int): Int = {
    val h = h1 + k.toLong * h2
    ((h % numCells + numCells) % numCells).toInt
  }

  def add(item: String): this.type = {
    val (h1, h2) = halves(item)
    var k = 0
    while (k < numHashes) { cells(cellOf(h1, h2, k)) += 1; k += 1 }
    this
  }

  def remove(item: String): this.type = {
    val (h1, h2) = halves(item)
    // validate every cell BEFORE decrementing any: a refused remove
    // must leave the filter untouched
    var k = 0
    while (k < numHashes) {
      require(cells(cellOf(h1, h2, k)) > 0,
        "remove of an item the filter cannot contain - refusing to corrupt cells")
      k += 1
    }
    k = 0
    while (k < numHashes) { cells(cellOf(h1, h2, k)) -= 1; k += 1 }
    this
  }

  def mightContain(item: String): Boolean = {
    val (h1, h2) = halves(item)
    var k = 0
    while (k < numHashes) {
      if (cells(cellOf(h1, h2, k)) == 0) return false
      k += 1
    }
    true
  }

  /** Element-wise merge (commutative, associative — the treeAggregate
    * combiner). Both operands must share sizing, like
    * BloomFilter.mergeInPlace. */
  def mergeInPlace(o: CountingBloom): this.type = {
    require(o.numCells == numCells && o.numHashes == numHashes,
      s"incompatible counting blooms: ($numCells,$numHashes) vs (${o.numCells},${o.numHashes})")
    var i = 0
    while (i < numCells) { cells(i) += o.cells(i); i += 1 }
    this
  }

  /** Element-wise SUBTRACT (the group inverse of [[mergeInPlace]]) —
    * the forget roll's distributed form: the tombstone set builds its
    * OWN counting bloom by one treeAggregate (same (n, fpp) sizing, so
    * cells align by construction) and comes off the standing filter
    * cell-wise, O(1) driver memory — never a per-item collect. Because
    * build(A) − build(T) = build(A ∖ T) cell-for-cell when T is a
    * sub-multiset of A (each cell is a plain sum of per-item
    * increments, and builders insert every occurrence — see the class
    * contract), the result is BIT-identical to rebuilding over the
    * survivors for any corpus, which CountingBloomSpec gates on
    * serialized bytes.
    *
    * The refused-remove contract survives in aggregate form: a
    * tombstone bloom containing any never-added item can only drive
    * some cell negative if the standing cells cannot cover it, and the
    * validation pass runs BEFORE any mutation — a refused subtract
    * leaves the filter untouched, like [[remove]]. (A never-added item
    * whose cells all collide with standing items' cells is absorbed —
    * the same fpp-bounded ambiguity a per-item remove has.) */
  def subtractInPlace(o: CountingBloom): this.type = {
    require(o.numCells == numCells && o.numHashes == numHashes,
      s"incompatible counting blooms: ($numCells,$numHashes) vs (${o.numCells},${o.numHashes})")
    var i = 0
    while (i < numCells) {
      require(cells(i) >= o.cells(i),
        s"subtract would drive cell $i negative (${cells(i)} - ${o.cells(i)}) - " +
          "tombstone set contains items the filter cannot contain; refusing to corrupt cells")
      i += 1
    }
    i = 0
    while (i < numCells) { cells(i) -= o.cells(i); i += 1 }
    this
  }

  def writeTo(out: java.io.OutputStream): Unit = {
    val d = new java.io.DataOutputStream(new java.io.BufferedOutputStream(out))
    d.writeInt(numCells); d.writeInt(numHashes)
    var i = 0
    while (i < numCells) { d.writeInt(cells(i)); i += 1 }
    d.flush()
  }

  def serializedBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeTo(bos); bos.toByteArray
  }
}

object CountingBloom {

  /** Standard bloom sizing (m = −n·ln p / ln²2 cells, k = m/n·ln 2
    * hashes) — the same formula the bit bloom uses; each cell is an
    * int, which is the counting variant's documented ~8× space
    * trade. */
  def sized(expectedItems: Long, fpp: Double): CountingBloom = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    require(m <= Int.MaxValue, s"counting bloom of $m cells exceeds array bounds")
    val k = math.max(1, math.round(m.toDouble / expectedItems * math.log(2)).toInt)
    new CountingBloom(m.toInt, k)
  }

  def readFrom(in: java.io.InputStream): CountingBloom = {
    val d = new java.io.DataInputStream(new java.io.BufferedInputStream(in))
    val m = d.readInt(); val k = d.readInt()
    val cells = new Array[Int](m)
    var i = 0
    while (i < m) { cells(i) = d.readInt(); i += 1 }
    new CountingBloom(m, k, cells)
  }

  /** Distributed build: one treeAggregate over a fingerprint Dataset —
    * per-partition local filters, log-depth element-wise merges. */
  def build(fps: org.apache.spark.sql.Dataset[String],
      expectedItems: Long, fpp: Double): CountingBloom = {
    val (m, k) = { val proto = sized(expectedItems, fpp); (proto.numCells, proto.numHashes) }
    fps.rdd.treeAggregate(new CountingBloom(m, k))(
      (cb, fp) => cb.add(fp), (a, b) => a.mergeInPlace(b))
  }
}
