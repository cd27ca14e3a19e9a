package graft.queries

import graft.{Staging, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spectral embedding analysis — PCA's top principal direction by
  * SUFFICIENT STATISTICS plus a fixed-point POWER ITERATION, the
  * dimensionality-reduction member of the vector family (production
  * uses: whitening/compacting embedding stores before ANN, drift
  * diagnostics on the dominant direction, low-rank pre-filters).
  *
  * The scale shape is the regression-by-sufficient-statistics
  * discipline (Relational4) lifted to matrices: ONE corpus pass
  * computes the per-dimension sums (means), ONE explode-aggregate pass
  * computes the centered upper-triangle Gram matrix (d(d+1)/2 = 2,080
  * cells at d=64, map-side combined — never a vector self-join), and
  * everything after runs on broadcast-small 64/2,080-row frames: the
  * spectral solve costs O(d² · iters) independent of corpus size. At
  * 100 TB the corpus contributes exactly two scans.
  *
  * Exact arithmetic (the repo's fixed-point discipline, here for
  * linear algebra): embeddings quantize by floor(x·10⁶); all integer
  * divisions are TRUNCATING toward zero — Spark's `div` and DuckDB's
  * `//` share that semantic even on negative operands (verified:
  * −7//2 = −3 in DuckDB; an assumed floor semantic drifted the means
  * by 1 during development and the hash gate caught it); the Gram
  * matrix rescales by `(max|c| div 10⁶) + 1` so every matrix–vector
  * product stays inside int64 at any corpus size up to the
  * input-audited ~2.3M-vector bound (nRows·(2Q)² ≤ int64, required
  * at build time BEFORE the aggregate can wrap; measured witness: the
  * ×100 rehearsal's 200k-vector train completed in 41 s with the
  * audit holding at ~40× headroom — PLANS.md round 14); three
  * iterations from the all-ones ppm start, renormalized
  * to ≤10⁶ by max-component truncating division. Every step is
  * integer-exact and replayed CTE-for-CTE by the oracle;
  * SpectralSpec adds a third direct-Scala replay (bit-for-bit) AND a
  * quality dial — cosine ≥ 0.99 against a DOUBLE-precision twin of
  * the same 3 iterations, which is what the fixed point claims to
  * track. (Convergence to the true eigenvector is a property of the
  * spectrum, not the arithmetic: the fixture's md5-random embeddings
  * are deliberately isotropic, λ1/λ2 ≈ 1, where no fixed iteration
  * count separates the top direction; production embedding corpora
  * are anisotropic and converge in a few iterations — the spec
  * REPORTS the fixture's flatness readout rather than asserting an
  * unreachable bar.)
  *
  * Reference tie-in: the reference has no vector surface (it delegates
  * analysis to BigQuery, README.md:3); this belongs to the
  * LLM-pipeline extension mandated by the build brief.
  */
object SpectralQueries {

  private val Q = 1000000L   // ppm quantization / normalization target
  private val Iters = 3

  /** Truncating integer division a/b — Spark's `div` and DuckDB's `//`
    * BOTH truncate toward zero (verified on negative operands: −7//2 =
    * −3 in DuckDB), so plain `div` is exact cross-engine parity even
    * for the negative sums embeddings produce. Integral `div` (not
    * `/`): double division would round above 2^53, and the Gram cells
    * reach 3.2e18 at the ×100 bound. */
  private def tdiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** The trained artifact `(dim, mean_q, v_ppm)` — per-dimension
    * quantized floor-mean and the iterated direction — built once per
    * (JVM, dir); both queries serve from it (train-once lifecycle). */
  private[graft] def pcaArtifact(s: SparkSession, d: String): DataFrame =
    Staging.frame(s, "pca_v", d) {
      val q = quantized(s, d, lit(true)).localCheckpoint()
      val vals = q.select(col("vec_id"), posexplode(col("qx")).as(Seq("i", "x")))
      val nRows = q.count() // plan-time scalar for the mean divisor
      // INPUT-derived int64 audit (round-13 ADVICE; bound made
      // DATA-derived in round 15 per ADVICE): in non-ANSI Spark an
      // overflowing sum(z_i·z_j) WRAPS before any check on the
      // computed cells can see it, so the bound must come from the
      // inputs. |m| ≤ max|x| under truncating div, so |z| ≤ 2·max|x|
      // and |c| ≤ nRows·(2·max|x|)² — with max|x| MEASURED from the
      // quantized corpus (one extra column in the per-dim aggregate
      // below), not assumed from the |raw| ≤ 1 ⇒ |x| ≤ Q convention;
      // a corpus with components outside [-1, 1] now tightens the
      // admissible nRows instead of silently voiding the audit. Q
      // stays only as the EXPECTED magnitude (~2.3M vectors at
      // max|x| = Q = 10⁶). The require rejects out-of-headroom
      // corpora BEFORE the Gram aggregate can wrap; the cmax check
      // below then only sizes the rescale margin, which is all it
      // can soundly do. (The per-dim sums this aggregate also
      // computes stay in-bounds whenever the require passes:
      // nRows·max|x| ≤ int64/(4·max|x|) < int64; on failure the
      // require aborts before any downstream use.)
      // the (s1, ma) per-dim aggregate is dimMoments — the SAME code
      // the maintenance rolls persist, so the trained path and the
      // rolls cannot audit or average differently (round-16 review)
      val dimStats = dimMoments(q).localCheckpoint()
      val maxAbsX = maxAbsOf(dimStats)
      // divide SEQUENTIALLY: the product 4·max|x|² itself wraps int64
      // once max|x| ≥ 2^31, which would silently void this audit on
      // exactly the out-of-headroom corpora it exists to reject
      require(nRows <= Long.MaxValue / 4L / maxAbsX / maxAbsX,
        s"Gram sums could exceed int64: $nRows vectors x (2*max|x|)^2 at " +
          s"measured max|x|=$maxAbsX (expected ~Q=$Q) " +
          "- requantize (lower Q) or shard the corpus")
      val means = dimStats
        .withColumn("m", tdiv(col("s1"), lit(nRows)))
        .select(col("i"), col("m"))
      val zv = vals.join(broadcast(means), Seq("i"))
        .select(col("vec_id"), col("i"), (col("x") - col("m")).as("z"))
        .localCheckpoint()
      // centered upper-triangle Gram matrix in ONE map-side-combined
      // aggregate — explode per-row (i ≤ j) products, never a
      // corpus self-join on vec_id
      val zArr = zv.groupBy(col("vec_id"))
        .agg(expr("transform(array_sort(collect_list(struct(i, z))), t -> t.z)").as("za"))
      val cov = zArr.select(explode(expr(
          "flatten(transform(sequence(0, size(za) - 1), i -> " +
            "transform(sequence(i, size(za) - 1), j -> " +
            "struct(i AS i, j AS j, za[i] * za[j] AS p))))")).as("t"))
        .groupBy(col("t.i").as("i"), col("t.j").as("j"))
        .agg(sum(col("t.p")).as("c"))
        .localCheckpoint()
      solveFromCov(means, cov)
    }

  /** The spectral solve tail shared by the trained artifact and the
    * maintenance rolls: rescale the upper-triangle Gram, mirror it,
    * run the fixed-point power iteration, join the means — everything
    * downstream of the Gram is a deterministic integer function of
    * (means, cov), which is what makes the moment-form maintenance
    * gates exact equalities. */
  private def solveFromCov(means: DataFrame, cov: DataFrame): DataFrame = {
    // margin check on the computed cells (|c| ≤ 3.2e18 at the 800k
    // ×100 bound): NOT an overflow guard — a wrapped sum would pass
    // it — the input-derived require above is the sound audit; this
    // read sizes the rescale and keeps a loud secondary tripwire
    val cmax = cov.agg(max(abs(col("c"))).as("cm")).head.getLong(0)
    require(cmax < Long.MaxValue / 2,
      s"Gram cells at int64 risk: $cmax — requantize (lower Q)")
    val scale = cmax / Q + 1
    val cRed = cov.select(col("i"), col("j"), tdiv(col("c"), lit(scale)).as("c"))
    val cFull = cRed.union(
      cRed.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("c")))
      .localCheckpoint()
    var v = cFull.select(col("i").as("j")).distinct()
      .withColumn("v", lit(Q)).localCheckpoint()
    (1 to Iters).foreach { _ =>
      val u = cFull.join(broadcast(v), Seq("j"))
        .groupBy(col("i")).agg(sum(col("c") * col("v")).as("u"))
      val den = u.agg((tdiv(max(abs(col("u"))), lit(Q)) + 1).as("dn"))
      v = u.crossJoin(broadcast(den))
        .select(col("i").as("j"), tdiv(col("u"), col("dn")).as("v"))
        .localCheckpoint()
    }
    means.join(v.withColumnRenamed("j", "i"), Seq("i"))
      .select(col("i").cast("long").as("dim"), col("m").as("mean_q"),
        col("v").as("v_ppm"))
      .localCheckpoint()
  }

  // ---- moment-form maintenance (round 16): the centered Gram is an
  // exact integer function of the UNcentered moments (n, S1, S2) —
  // Σ(x_i−m_i)(x_j−m_j) = S2_ij − m_i·S1_j − m_j·S1_i + n·m_i·m_j with
  // m = S1 div n — and the moments are a GROUP under addition, so the
  // PCA artifact gets update/delete rolls whose gates are equalities
  // against the rebuild chain (the k-means/LM/BM25 algebra, lifted to
  // matrix statistics).

  /** Quantized slice `(vec_id, qx)` — the artifact's own encoding.
    * [[quantizedOf]] is the per-frame form (the streaming roll's
    * micro-batches), factored so the two cannot drift. */
  private def quantizedOf(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))")
        .as("qx"))

  private def quantized(s: SparkSession, d: String, where: Column): DataFrame =
    quantizedOf(Tables.embeddings(s, d).filter(where))

  /** Per-dim first moments + measured max|x| of a slice. */
  private def dimMoments(q: DataFrame): DataFrame =
    q.select(posexplode(col("qx")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(col("x")).as("s1"), max(abs(col("x"))).as("ma"))

  /** Upper-triangle UNcentered second moments of a slice. */
  private def upperMoments(q: DataFrame): DataFrame =
    q.select(explode(expr(
        "flatten(transform(sequence(0, size(qx) - 1), i -> " +
          "transform(sequence(i, size(qx) - 1), j -> " +
          "struct(i AS i, j AS j, qx[i] * qx[j] AS p))))")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("s2"))

  /** PERSISTED moment artifact of one slice (`full` — the delete
    * roll's standing base — or `day1`, even vec_ids, the update
    * roll's): s1/(i, s1, ma), s2/(i, j, s2), cnt/(n). The input-derived
    * int64 audit runs BEFORE the product aggregate (uncentered bound
    * n·max|x|² — wider headroom than the centered path's n·(2max|x|)²;
    * the derived-Gram bound is re-audited at merge time). */
  private[graft] def pcaMomentsDir(s: SparkSession, d: String, slice: String): String =
    Staging.onceDir(s, s"pca_mom_$slice", d) { p =>
      val q = (slice match {
        case "full" => quantized(s, d, lit(true))
        case "day1" => quantized(s, d, pmod(col("vec_id"), lit(2L)) === 0)
        case other  => throw new IllegalArgumentException(s"unknown moment slice $other")
      }).localCheckpoint()
      val s1 = dimMoments(q).localCheckpoint()
      val n = q.count()
      val ma = maxAbsOf(s1)
      require(n <= Long.MaxValue / ma / ma,
        s"uncentered Gram sums could exceed int64: $n vectors x max|x|^2 at " +
          s"measured max|x|=$ma - requantize (lower Q) or shard the corpus")
      s1.write.mode("overwrite").parquet(s"$p/s1")
      upperMoments(q).write.mode("overwrite").parquet(s"$p/s2")
      s.range(1).select(lit(n).as("n")).write.mode("overwrite").parquet(s"$p/cnt")
    }

  /** Measured max|x| off a per-dim moment frame (1L floor on empty). */
  private def maxAbsOf(s1: DataFrame): Long = {
    val maRow = s1.agg(max(col("ma"))).head
    if (maRow.isNullAt(0)) 1L else math.max(1L, maRow.getLong(0))
  }

  /** Finish the artifact from (merged) moments: re-derive the
    * truncated means, expand the centered Gram exactly, and run the
    * shared solve — bit-identical to training on the merged corpus
    * because every step is the same deterministic integer function. */
  private def artifactFromMoments(s1: DataFrame, s2: DataFrame, n: Long, ma: Long): DataFrame = {
    require(n > 0, "maintenance roll left an empty corpus")
    // the derived centered cells obey the trained path's bound
    // n·(2·max|x|)², and each expansion term is ≤ n·max|x|² — divide
    // sequentially exactly as the trained audit does
    require(n <= Long.MaxValue / 4L / ma / ma,
      s"Gram sums could exceed int64: $n vectors x (2*max|x|)^2 at " +
        s"measured max|x|=$ma - requantize (lower Q) or shard the corpus")
    val dims = s1.select(col("i"), col("s1"), tdiv(col("s1"), lit(n)).as("m"))
    val means = dims.select(col("i"), col("m"))
    val cov = s2
      .join(broadcast(dims.select(col("i"), col("s1").as("s1i"), col("m").as("mi"))), Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"), col("s1").as("s1j"), col("m").as("mj"))), Seq("j"))
      .select(col("i"), col("j"),
        (col("s2") - col("mi") * col("s1j") - col("mj") * col("s1i")
          + lit(n) * col("mi") * col("mj")).as("c"))
      .localCheckpoint()
    solveFromCov(means, cov)
  }

  /** The UPDATED artifact: day-2 (odd vec_id) moments folded into the
    * re-read day-1 parquet by plain addition, then the shared finish —
    * gate is vec_pca_power's full-corpus oracle VERBATIM. */
  private[graft] def updatedPcaArtifact(s: SparkSession, d: String): DataFrame =
    Staging.frame(s, "pca_upd", d) {
      val root = pcaMomentsDir(s, d, "day1")
      val q2 = quantized(s, d, pmod(col("vec_id"), lit(2L)) === 1).localCheckpoint()
      val s1B = dimMoments(q2).localCheckpoint()
      val s1A = s.read.parquet(s"$root/s1")
      val n = s.read.parquet(s"$root/cnt").head.getLong(0) + q2.count()
      val ma = math.max(maxAbsOf(s1A), maxAbsOf(s1B))
      require(n <= Long.MaxValue / ma / ma,
        s"uncentered Gram sums could exceed int64 at merge: $n x max|x|=$ma")
      val s1 = s1A.select(col("i"), col("s1")).unionByName(s1B.select(col("i"), col("s1")))
        .groupBy("i").agg(sum("s1").as("s1"))
      val s2 = s.read.parquet(s"$root/s2").unionByName(upperMoments(q2))
        .groupBy("i", "j").agg(sum("s2").as("s2"))
      artifactFromMoments(s1, s2, n, ma)
    }

  /** Tombstone residue of the PCA forget roll: vec_id ≡ 3 (mod 10). */
  private[graft] val PcaTombMod = 10L
  private[graft] val PcaTombRes = 3L

  /** The DELETED artifact: tombstone moments (one O(tombstones) pass)
    * SUBTRACTED from the re-read full parquet — gate is the rebuild
    * chain over survivors, an exact equality (survivor max|x| is not
    * subtractable, so the audit soundly bounds it by the standing
    * artifact's measured max). */
  private[graft] def deletedPcaArtifact(s: SparkSession, d: String): DataFrame =
    Staging.frame(s, "pca_del", d) {
      val root = pcaMomentsDir(s, d, "full")
      val qT = quantized(s, d,
        pmod(col("vec_id"), lit(PcaTombMod)) === PcaTombRes).localCheckpoint()
      val s1T = dimMoments(qT)
      val s1F = s.read.parquet(s"$root/s1")
      val n = s.read.parquet(s"$root/cnt").head.getLong(0) - qT.count()
      val ma = maxAbsOf(s1F)
      val s1 = s1F.select(col("i"), col("s1"))
        .unionByName(s1T.select(col("i"), negate(col("s1")).as("s1")))
        .groupBy("i").agg(sum("s1").as("s1"))
      val s2 = s.read.parquet(s"$root/s2")
        .unionByName(upperMoments(qT).select(col("i"), col("j"), negate(col("s2")).as("s2")))
        .groupBy("i", "j").agg(sum("s2").as("s2"))
      artifactFromMoments(s1, s2, n, ma)
    }

  // ---- oracle: the identical chain in DuckDB (`//` truncates toward
  // zero exactly like Spark's `div`; iterations unrolled from the same
  // constants — cannot drift)

  private def chainSql: String = chainSqlWhere("TRUE")

  /** The chain with a parameterized corpus slice — the delete roll's
    * rebuild oracle trains on survivors only; everything downstream of
    * `e` is shared verbatim. */
  private def chainSqlWhere(where: String): String = {
    def iter(k: Int): String = {
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""
u$k AS (SELECT cf.i, CAST(sum(cf.c * $pv.v) AS BIGINT) AS u FROM cf JOIN $pv ON $pv.j = cf.j GROUP BY 1),
d$k AS (SELECT (max(abs(u)) // $Q) + 1 AS dn FROM u$k),
v$k AS (SELECT i AS j, CAST(u // dn AS BIGINT) AS v FROM u$k, d$k)"""
    }
    raw"""
WITH e AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) for x in embedding] AS qx FROM embeddings WHERE $where),
nn AS (SELECT count(*) AS n FROM e),
exp AS (SELECT vec_id, CAST(unnest(range(0, len(qx))) AS INT) AS i, qx FROM e),
vals AS (SELECT vec_id, i, qx[i + 1] AS x FROM exp),
means AS (SELECT i, CAST(sum(x) AS BIGINT) AS sx FROM vals GROUP BY i),
mm AS (SELECT i, CAST(sx // n AS BIGINT) AS m FROM means, nn),
zv AS (SELECT vec_id, vals.i, x - m AS z FROM vals JOIN mm ON mm.i = vals.i),
cov AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.z * b.z) AS BIGINT) AS c
        FROM zv a JOIN zv b ON b.vec_id = a.vec_id AND b.i >= a.i GROUP BY 1, 2),
sc AS (SELECT (max(abs(c)) // $Q) + 1 AS s FROM cov),
cr AS (SELECT i, j, CAST(c // s AS BIGINT) AS c FROM cov, sc),
cf AS (SELECT i, j, c FROM cr UNION ALL SELECT j AS i, i AS j, c FROM cr WHERE i <> j),
v0 AS (SELECT DISTINCT i AS j, CAST($Q AS BIGINT) AS v FROM cf),${(1 to Iters).map(iter).mkString(",")}"""
  }

  val defs: Seq[QueryDef] = Seq(

    // The trained spectral artifact: per-dimension quantized floor-mean
    // and the iterated principal direction in ppm.
    QueryDef("vec_pca_power", Some(chainSql + s"""
      SELECT CAST(mm.i AS BIGINT) AS dim, mm.m AS mean_q, v$Iters.v AS v_ppm
      FROM mm JOIN v$Iters ON v$Iters.j = mm.i ORDER BY dim""")) { (s, d) =>
      pcaArtifact(s, d).orderBy(col("dim"))
    },

    // The deployment half: every vector's exact integer projection onto
    // the trained direction — one broadcast join against the 64-row
    // artifact, a single corpus pass (the map-side re-encode shape of
    // vec_quantize_int8).
    QueryDef("vec_pca_project", Some(chainSql + s"""
      , pj AS (SELECT vec_id, CAST(sum((x - m) * v) AS BIGINT) AS proj
               FROM vals JOIN mm ON mm.i = vals.i
               JOIN v$Iters ON v$Iters.j = vals.i
               GROUP BY 1)
      SELECT vec_id, proj FROM pj ORDER BY vec_id""")) { (s, d) =>
      val art = pcaArtifact(s, d)
        .select(col("dim").cast("int").as("i"), col("mean_q"), col("v_ppm"))
      quantized(s, d, lit(true))
        .select(col("vec_id"), posexplode(col("qx")).as(Seq("i", "x")))
        .join(broadcast(art), Seq("i"))
        .groupBy(col("vec_id"))
        .agg(sum((col("x") - col("mean_q")) * col("v_ppm")).as("proj"))
        .orderBy(col("vec_id"))
    },

    /** Artifact MAINTENANCE — PCA joins the maintained roster in
      * MOMENT form (the LM's count-form move, lifted to matrix
      * statistics): day-1 (even vec_id) uncentered moments persist
      * once; day-2 folds in by plain integer addition, the centered
      * Gram re-expands exactly from the merged (n, S1, S2), and the
      * shared solve runs — BIT-identical to training on the full
      * corpus, so the gate is vec_pca_power's oracle VERBATIM. The
      * nightly roll reads the day's vectors and a d + d(d+1)/2-row
      * parquet — never the standing corpus. */
    QueryDef("vec_pca_update", Some(chainSql + s"""
      SELECT CAST(mm.i AS BIGINT) AS dim, mm.m AS mean_q, v$Iters.v AS v_ppm
      FROM mm JOIN v$Iters ON v$Iters.j = mm.i ORDER BY dim""")) { (s, d) =>
      updatedPcaArtifact(s, d).orderBy(col("dim"))
    },

    /** ONLINE moment roll (round 18) — `vec_pca_update`'s streaming
      * twin, extending the streaming-maintenance matrix to the
      * spectral family: day-2 vectors arrive as TWO real
      * micro-batches, each trigger reduces its batch to UNcentered
      * moments (per-dim S1 + upper-triangle S2 + count — one O(batch)
      * pass) into batch-id-keyed idempotent log dirs; the standing
      * day-1 moment parquet is NEVER read in-stream. ONE post-drain
      * fold sums day-1 ∪ logged moments (a commutative GROUP — the
      * micro-batch split provably cannot change any cell), re-audits
      * the int64 Gram bound at the merged count, expands the centered
      * Gram exactly, and re-runs the shared solve. Output IS the
      * updated artifact, so the batch twin's full-corpus rebuild
      * oracle (shared VERBATIM) is itself the complete stream==batch
      * gate — no separate artifact spec is needed. */
    QueryDef("stream_pca_update", Some(chainSql + s"""
      SELECT CAST(mm.i AS BIGINT) AS dim, mm.m AS mean_q, v$Iters.v AS v_ppm
      FROM mm JOIN v$Iters ON v$Iters.j = mm.i ORDER BY dim""")) { (s, d) =>
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.EventStreams
      val day1Root = pcaMomentsDir(s, d, "day1")
      val root = Staging.dir("pcasupd", d)
      val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val day2 = Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(2L)) === 1)
      Seq(day2.filter(pmod(col("vec_id"), lit(4L)) === 1),
          day2.filter(pmod(col("vec_id"), lit(4L)) === 3))
        .zipWithIndex.foreach { case (b, i) =>
          b.coalesce(1).write.mode(if (i == 0) "overwrite" else "append")
            .parquet(s"$root/in")
        }
      val schema = s.read.parquet(s"$root/in").schema
      EventStreams.withStreamConf(s) {
        EventStreams.awaitOrKill(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(s"$root/in")
            .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              val q = quantizedOf(b).localCheckpoint()
              dimMoments(q).write.mode("overwrite").parquet(s"$root/log/s1_b$id")
              upperMoments(q).write.mode("overwrite").parquet(s"$root/log/s2_b$id")
              s.range(1).select(lit(q.count()).as("n"))
                .write.mode("overwrite").parquet(s"$root/log/cnt_b$id")
              ()
            }
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow())
            .start(),
          "stream_pca_update")
      }
      // the one fold: moment addition + the shared exact finish
      val s1A = s.read.parquet(s"$day1Root/s1")
      val s1B = s.read.schema("i INT, s1 LONG, ma LONG").parquet(s"$root/log/s1_b*")
      val n = s.read.parquet(s"$day1Root/cnt").head.getLong(0) +
        s.read.schema("n LONG").parquet(s"$root/log/cnt_b*")
          .agg(sum(col("n"))).head.getLong(0)
      val ma = math.max(maxAbsOf(s1A), maxAbsOf(s1B))
      require(n <= Long.MaxValue / ma / ma,
        s"uncentered Gram sums could exceed int64 at merge: $n x max|x|=$ma")
      val s1 = s1A.select(col("i"), col("s1"))
        .unionByName(s1B.select(col("i"), col("s1")))
        .groupBy("i").agg(sum("s1").as("s1"))
      val s2 = s.read.parquet(s"$day1Root/s2")
        .unionByName(s.read.schema("i INT, j INT, s2 LONG").parquet(s"$root/log/s2_b*"))
        .groupBy("i", "j").agg(sum("s2").as("s2"))
      artifactFromMoments(s1, s2, n, ma).orderBy(col("dim"))
    },

    /** Artifact FORGETTING — tombstoned vectors (vec_id ≡ 3 mod 10)
      * leave by moment SUBTRACTION (one O(tombstones) pass), the means
      * and centered Gram re-derive exactly, and the solve reruns: the
      * principal direction provably retains NOTHING of the forgotten
      * vectors, because subtract == retrain bit-for-bit — the oracle
      * replays the rebuild chain over survivors and the gate is an
      * EQUALITY (the sixth delete mechanism, the third exact one). */
    QueryDef("vec_pca_delete", Some(
      chainSqlWhere(s"vec_id % $PcaTombMod <> $PcaTombRes") + s"""
      SELECT CAST(mm.i AS BIGINT) AS dim, mm.m AS mean_q, v$Iters.v AS v_ppm
      FROM mm JOIN v$Iters ON v$Iters.j = mm.i ORDER BY dim""")) { (s, d) =>
      deletedPcaArtifact(s, d).orderBy(col("dim"))
    },
  )
}
