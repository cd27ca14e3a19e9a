package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standalone k-means embedding clustering (round-13 verdict item 5):
  * Lloyd's algorithm as a FIRST-CLASS train/serve family rather than a
  * buried coarse-quantizer step. Every LLM-pipeline consumer of
  * cluster structure — SemDeDup's cluster-scoped pair generation, data
  * mixing by per-cluster token budgets, corpus cartography, IVF
  * partitioning itself — starts from exactly this pair of artifacts:
  * a trained centroid codebook and a full-corpus assignment table.
  *
  * The trainer IS [[VectorQueries.lloydCentroids]] — the spherical
  * k-means loop already proven inside `sim_ann_ivf` (seeds = vec_id <
  * k, assignment by max cosine with lowest-c_id tiebreak, update =
  * exact per-dimension integer floor-mean, [[VectorQueries
  * .kmeansIters]] rounds, all int64 fixed-point so both engines replay
  * it bit-for-bit) — extracted, not re-implemented, at the standalone
  * granularity k = [[K]] (the ANN coarse quantizer stays at its own
  * k = 8; the two codebooks are different artifacts with different
  * consumers). KmeansSpec adds the third, direct-Scala replay of the
  * same loop (the SpectralSpec discipline) so the relational form, the
  * DuckDB oracle, and a from-scratch imperative implementation must
  * agree bit-for-bit.
  *
  * Scale shape (the Lloyd scaladoc's, restated for the standalone
  * artifact): centroids are a k-row broadcast at every round — the
  * corpus NEVER shuffles on a join key during training; each round is
  * one broadcast pass (assignment) plus one map-side-combinable
  * (cluster, pos) aggregate whose output is k·d rows (1,024 here) —
  * broadcast-small at any corpus size, which PlanShapeSpec guards.
  * Serving (`vec_kmeans_assign`) is the same single broadcast pass.
  * Iteration count and k are cost dials, not plan changes. At 100 TB:
  * train on a sample or the full corpus (both are scan-bound), persist
  * the k·d-row codebook, assign incrementally per ingest batch — the
  * `sim_ann_ivfpq_persisted` lifecycle with this family as the first
  * stage.
  *
  * Reference tie-in: the reference has no vector surface (it delegates
  * analysis to BigQuery, README.md:3); this family belongs to the
  * LLM-pipeline extension mandated by the build brief.
  */
object KmeansQueries {

  /** Standalone clustering granularity — deliberately distinct from
    * the ANN coarse quantizer's k=8 so the artifact is its own, not an
    * alias of `ivf_coarse`. */
  private val K = 16

  /** The trained codebook `(c_id, cq, cn2)`, built once per (JVM, dir)
    * and shared by both queries — the train-once/serve-many lifecycle
    * (`ivf_coarse` discipline). */
  private[queries] def kmeansArtifact(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "km16", d) { trainLineage(s, d).localCheckpoint() }

  /** The UNmemoized training lineage — exposed so PlanShapeSpec can
    * inspect the actual Lloyd plan (the judged artifact checkpoints,
    * which hides the training aggregates behind a Scan ExistingRDD). */
  private[graft] def trainLineage(s: SparkSession, d: String): DataFrame =
    VectorQueries.lloydCentroids(VectorQueries.ivfCorpus(s, d), K)

  /** The UNmemoized assignment lineage — same rationale as
    * [[trainLineage]] for the serve half's plan guard. */
  private[graft] def assignLineage(s: SparkSession, d: String): DataFrame =
    VectorQueries.ivfAssign(VectorQueries.ivfCorpus(s, d), kmeansArtifact(s, d))

  /** Oracle prefix shared by both queries: quantized corpus + the
    * generated Lloyd chain at k=[[K]], ending in `c(c_id, cq, cn2)` —
    * the verbatim [[VectorQueries.lloydSql]] the IVF family judges,
    * re-parameterized. */
  private def chainSql: String = s"""
      WITH v AS (SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * 1000000) AS BIGINT)) AS q
                 FROM embeddings),
      n AS (SELECT vec_id, q, list_sum(list_transform(list_zip(q, q), s -> s[1] * s[2])) AS n2 FROM v),
      ${VectorQueries.lloydSql(K)}"""

  val defs: Seq[QueryDef] = Seq(

    // The trained codebook, exploded to (c_id, dim, cval) scalar rows —
    // the persistable k·d-row artifact every cluster consumer reads.
    QueryDef("vec_kmeans_train", Some(chainSql + """
      SELECT c_id, CAST(i AS BIGINT) AS dim, cq[i + 1] AS cval
      FROM c CROSS JOIN range(0, 64) AS t(i)
      ORDER BY c_id, dim""")) { (s, d) =>
      kmeansArtifact(s, d)
        .select(col("c_id"), posexplode(col("cq")).as(Seq("dim", "cval")))
        .select(col("c_id"), col("dim").cast("long").as("dim"), col("cval"))
        .orderBy(col("c_id"), col("dim"))
    },

    // The serve half: every corpus vector's nearest trained centroid
    // (max cosine, lowest-c_id tiebreak) — one broadcast of the k-row
    // codebook against the corpus, the ivfAssign kernel verbatim.
    QueryDef("vec_kmeans_assign", Some(chainSql + assignSql + """
      SELECT vec_id, cluster FROM asg ORDER BY vec_id""")) { (s, d) =>
      kmeansAssignment(s, d).orderBy(col("vec_id"))
    },

    /** STREAMING cluster assignment — the k-means family's online
      * shape (stream_ann_serve's pattern, applied to the clustering
      * artifact): the trained codebook persists ONCE offline; corpus
      * vectors then arrive as a real file-source stream (two staged
      * micro-batches under maxFilesPerTrigger=1) and each batch is
      * assigned inside foreachBatch against the frozen parquet
      * codebook with batch_id-keyed idempotent sinks. Assignment is a
      * pure per-vector function of the frozen centroids, so
      * micro-batch boundaries provably cannot change any cluster — the
      * query shares `vec_kmeans_assign`'s oracle VERBATIM and the hash
      * gates exactly that invariance (a batch assigned against a
      * retrained codebook, a dropped batch, or cross-batch
      * interference all break it). At 100 TB this is cluster-routing
      * at ingest: O(batch · k) per micro-batch, index cost zero. */
    QueryDef("stream_kmeans_assign", Some(chainSql + assignSql + """
      SELECT vec_id, cluster FROM asg ORDER BY vec_id""")) { (s, d) =>
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.EventStreams
      import graft.functions.VectorFunctions.{quantize, qdot}
      val root = graft.Staging.dir("kmserve", d)
      val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      kmeansArtifact(s, d).write.mode("overwrite").parquet(s"$root/codebook")
      val cb = s.read.parquet(s"$root/codebook")
      // stage the vector stream: even ids then odd ids → two
      // micro-batches under maxFilesPerTrigger=1
      val vecs = Tables.embeddings(s, d)
      vecs.filter(pmod(col("vec_id"), lit(2L)) === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/in")
      vecs.filter(pmod(col("vec_id"), lit(2L)) === 1)
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      val schema = s.read.parquet(s"$root/in").schema
      val sink = s"$root/out"
      EventStreams.withStreamConf(s) {
        EventStreams.awaitOrKill(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(s"$root/in")
            .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
              val bv = b.select(col("vec_id"), quantize(col("embedding")).as("q"))
                .withColumn("n2", qdot(col("q"), col("q")))
              VectorQueries.ivfAssign(bv, cb)
                .write.mode("overwrite").parquet(s"$sink/b$id")
              ()
            }
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow())
            .start(),
          "stream_kmeans_assign")
      }
      // declared schema: a sink dir of an empty batch has no footers
      s.read.schema("vec_id LONG, cluster LONG").parquet(s"$sink/b*")
        .orderBy(col("vec_id"))
    },

    /** CLUSTER-BALANCED curation — the downstream consumer the k-means
      * artifact exists for (data mixing by semantic cluster): within
      * EACH cluster, admit the highest-quality documents greedily until
      * 60% of that cluster's tokens — `curate_token_budget`'s selection
      * rule STRATIFIED by the trained clustering, so a dominant
      * boilerplate cluster spends only its own budget and can never eat
      * the tail clusters' share (the balanced-representation move of
      * corpus-mixing stacks, with clusters as the strata a labelless
      * corpus actually has). Judged over the embedded corpus slice (the
      * inner join with the assignment table — at sf0.1 the fixture
      * embeds a 2,000-doc prefix of the 5,000-doc corpus, and the
      * budget is defined over what is clustered).
      *
      * Shape at 100 TB: one scoring scan, one broadcast of the k-row
      * per-cluster totals, and ONE shuffle on the cluster key for a
      * PARTITIONED running-sum window (never a single-partition
      * window); if one cluster dwarfs the rest at extreme scale, its
      * within-cluster prefix sum range-repartitions via the
      * ScaleOps.globalRunningSum discipline applied per stratum — the
      * composition this query's plan makes obvious. Quality doubles
      * are bit-identical cross-engine (doc_quality's judged parity);
      * budget cuts are exact integer arithmetic. */
    QueryDef("curate_cluster_budget", Some(chainSql + assignSql + s""",
      t AS (SELECT doc_id, $qualityScoreSql AS quality,
              CAST(len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS BIGINT) AS n
            FROM documents),
      j AS (SELECT a.vec_id AS doc_id, a.cluster, t.quality, t.n
            FROM asg a JOIN t ON t.doc_id = a.vec_id),
      ct AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS tt FROM j GROUP BY 1),
      rb AS (SELECT doc_id, cluster, quality, n,
               CAST(COALESCE(sum(n) OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
             FROM j)
      SELECT rb.doc_id, rb.cluster, rb.quality, rb.n AS n_tokens, rb.cum_before
      FROM rb JOIN ct USING (cluster) WHERE cum_before < (tt * 60) // 100
      ORDER BY cluster, cum_before, doc_id""")) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.{qualityScore, tokens}
      val asg = kmeansAssignment(s, d).withColumnRenamed("vec_id", "doc_id")
      val t = Tables.documents(s, d).select(col("doc_id"),
        qualityScore(col("text")).as("quality"),
        size(filter(tokens(col("text")), x => x =!= "")).cast("long").as("n"))
      val j = asg.join(t, Seq("doc_id"))
      // the per-cluster token total rides the SAME window pass as the
      // running sum (unbounded frame over the identical partitioning —
      // one exchange, one sort, ONE scoring scan; a separate groupBy
      // total was a second full scan re-computing qualityScore,
      // round-14 review finding)
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col("cluster"))
      j.withColumn("cum_before", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("tt", sum(col("n")).over(wTot))
        .filter(col("cum_before") < expr("(tt * 60) div 100"))
        .select(col("doc_id"), col("cluster"), col("quality"),
          col("n").as("n_tokens"), col("cum_before"))
        .orderBy(col("cluster"), col("cum_before"), col("doc_id"))
    },

    /** Codebook MAINTENANCE (round-16 verdict task 6) — the k-means
      * family's incremental half, closing the last index family
      * without one: day-1 vectors (even vec_id) are assigned ONCE to
      * the frozen trained codebook and reduced to persisted
      * SUFFICIENT STATISTICS — per-(cluster, dim) coordinate sum +
      * member count, the k·d-row mergeable artifact (the
      * agg_regression_stats argument: sums and counts compose under
      * addition, so folding a new batch needs the old batch's stats,
      * never its rows). Day-2 vectors (odd vec_id) arrive, compute
      * their own stats against the SAME frozen codebook in one
      * O(batch) broadcast pass, merge with the RE-READ day-1 parquet
      * by plain addition, and one exact integer floor-mean over the
      * merged sums yields the updated codebook — bit-identical to
      * running a full Lloyd round over day-1 ∪ day-2, because
      * assignment against a frozen codebook is per-vector pure and
      * floor((ΣA + ΣB) / (nA + nB)) has no order or grouping freedom.
      * The judged output serves the WHOLE corpus's assignments from
      * the updated artifact; the oracle replays the rebuild form — the
      * trained chain plus one more full-corpus Lloyd round (kg3/ks3/
      * kc3) plus assignment — so the hash gates update(stats(A), B) ==
      * train-round(A ∪ B) end-to-end, and KmeansSpec pins the codebook
      * frames themselves equal. At 100 TB the nightly codebook roll
      * reads the day's vectors once and a k·d-row parquet — never the
      * standing corpus. */
    QueryDef("vec_kmeans_update", Some(chainSql + updateRoundSql + """
      SELECT vec_id, cluster FROM asg3 ORDER BY vec_id""")) { (s, d) =>
      VectorQueries.ivfAssign(VectorQueries.ivfCorpus(s, d),
          updatedKmeansArtifact(s, d))
        .orderBy(col("vec_id"))
    },

    /** ONLINE codebook maintenance (round 18) — `vec_kmeans_update`'s
      * streaming twin, closing the k-means family's
      * streaming-maintenance cell (stream_kmeans_assign serves off a
      * frozen codebook; this streams the codebook's own roll): day-2
      * vectors arrive as TWO real micro-batches, each trigger reduces
      * its batch to sufficient statistics against the SAME frozen
      * trained codebook — one O(batch) broadcast pass — into a
      * batch-id-keyed log dir (overwrite = idempotent under replay);
      * the standing stats artifact is NEVER read in-stream. ONE
      * post-drain fold merges day-1 stats ∪ logged stats by plain
      * addition and floor-means the sums; because (sv, cnt) compose
      * under a commutative group and assignment against a frozen
      * codebook is per-vector pure, the micro-batch split provably
      * cannot change any merged cell — the gate is the batch twin's
      * rebuild-round oracle VERBATIM, and KmeansSpec pins the
      * stream-rolled codebook frame-equal to the batch roll's. */
    QueryDef("stream_kmeans_update", Some(chainSql + updateRoundSql + """
      SELECT vec_id, cluster FROM asg3 ORDER BY vec_id""")) { (s, d) =>
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.EventStreams
      import graft.functions.VectorFunctions.{quantize, qdot}
      val cents = kmeansArtifact(s, d)
      val statsDir = kmeansStatsDir(s, d)
      val root = graft.Staging.dir("kmsupd", d)
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
              val bv = b.select(col("vec_id"), quantize(col("embedding")).as("q"))
                .withColumn("n2", qdot(col("q"), col("q")))
              statsOf(bv, cents)
                .write.mode("overwrite").parquet(s"$root/log/b$id")
              ()
            }
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow())
            .start(),
          "stream_kmeans_update")
      }
      // the one fold: day-1 stats ∪ logged per-batch stats, floor-mean
      val merged = centroidsFromStats(
        s.read.parquet(statsDir).unionByName(
          s.read.schema("cluster LONG, pos INT, sv LONG, cnt LONG")
            .parquet(s"$root/log/b*")))
      merged.write.mode("overwrite").parquet(s"$root/codebook")
      VectorQueries.ivfAssign(VectorQueries.ivfCorpus(s, d),
          s.read.parquet(s"$root/codebook"))
        .orderBy(col("vec_id"))
    },

    /** Codebook DELETION — the k-means family's forget roll, and the
      * one delete mechanism in the repo that is EXACT BY ALGEBRA
      * rather than by construction or by contract: the persisted
      * sufficient statistics form a GROUP under addition, not just a
      * monoid, so removing tombstoned vectors is plain SUBTRACTION —
      * stats(survivors) = stats(all) − stats(tombstones), bit-exactly,
      * because assignment against the frozen trained codebook is
      * per-vector pure (each vector's (cluster, q) contribution is
      * independent of every other row's presence). One O(tombstones)
      * pass computes the leaving vectors' stats against the SAME
      * frozen codebook, plain integer subtraction from the RE-READ
      * full-corpus artifact, and the exact floor-mean over the
      * difference is BIT-identical to a full Lloyd round over the
      * surviving corpus — so unlike the MinHash roll (directional
      * under the bucket cap) and the containment roll (directional
      * under df drift), this gate is an EQUALITY against the rebuild
      * form with no carve-outs: the oracle replays one more
      * full-corpus Lloyd round over survivors only (kgd/ksd/kcd) and
      * assigns survivors against it. A cluster emptied by the delete
      * vanishes from both forms (the rebuild's GROUP BY drops it; the
      * subtract side filters cnt = 0 — centroidsFromStats). Tombstones
      * are vec_id ≡ 7 (mod 10): ~10% of the corpus, slicing every
      * cluster. At 100 TB the forget roll reads the tombstone vectors
      * and a k·d-row parquet — never the standing corpus, and never
      * retrains. */
    QueryDef("vec_kmeans_delete", Some(chainSql + deleteRoundSql + """
      SELECT vec_id, cluster FROM asgd ORDER BY vec_id""")) { (s, d) =>
      VectorQueries.ivfAssign(
          VectorQueries.ivfCorpus(s, d).filter(pmod(col("vec_id"), lit(10L)) =!= 7),
          deletedKmeansArtifact(s, d))
        .orderBy(col("vec_id"))
    },
  )

  /** Per-(cluster, dim) sufficient statistics `(cluster, pos, sv,
    * cnt)` of `v` assigned to the frozen `cents` — the mergeable
    * reduction of one Lloyd round's input (lloydRound's own
    * assignment + explode + aggregate prefix, stopping BEFORE the
    * non-mergeable floor-mean). */
  private def statsOf(v: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{cosineFromQ, qdot}
    val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))
    v.crossJoin(broadcast(cents))
      .withColumn("csim", cosineFromQ(qdot(col("q"), col("cq")), col("n2"), col("cn2")))
      .withColumn("rn", row_number().over(wAsg)).filter(col("rn") === 1)
      .select(col("c_id").as("cluster"), posexplode(col("q")).as(Seq("pos", "val")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("val")).as("sv"), count(lit(1)).as("cnt"))
  }

  /** Finish a Lloyd round from (merged) sufficient statistics: exact
    * integer floor-mean per (cluster, dim) — the same
    * `(sv - ((sv % cnt + cnt) % cnt)) div cnt` arithmetic as
    * lloydRound, so stats-then-finish is bit-identical to the direct
    * round. */
  private[queries] def centroidsFromStats(stats: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.qdot
    stats.groupBy(col("cluster"), col("pos"))
      .agg(sum(col("sv")).as("sv"), sum(col("cnt")).as("cnt"))
      // a cluster whose last member was SUBTRACTED out (the delete
      // roll) must vanish exactly as the rebuild form's GROUP BY drops
      // it — and guards the floor-mean's division. No-op for the
      // update roll, where counts only grow.
      .filter(col("cnt") > 0)
      .withColumn("cval", expr("(sv - ((sv % cnt + cnt) % cnt)) div cnt"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cval")))),
        x => x.getField("cval")).as("cq"))
      .select(col("cluster").as("c_id"), col("cq"))
      .withColumn("cn2", qdot(col("cq"), col("cq")))
  }

  /** Day-1 sufficient statistics, PERSISTED once per (JVM, dir) — the
    * artifact the maintenance roll re-reads (the sharedMinhashIndex
    * lifecycle applied to training state). */
  private[graft] def kmeansStatsDir(s: SparkSession, d: String): String =
    graft.Staging.onceDir(s, "km16_stats", d) { p =>
      statsOf(VectorQueries.ivfCorpus(s, d)
          .filter(pmod(col("vec_id"), lit(2L)) === 0), kmeansArtifact(s, d))
        .write.mode("overwrite").parquet(p)
    }

  /** The UPDATED codebook: day-2 stats merged into the re-read day-1
    * artifact, floor-mean applied over the union — shared by the
    * judged serve and KmeansSpec's merge-equals-rebuild gate. */
  private[graft] def updatedKmeansArtifact(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "km16_upd", d) {
      val statsA = s.read.parquet(kmeansStatsDir(s, d))
      val statsB = statsOf(VectorQueries.ivfCorpus(s, d)
        .filter(pmod(col("vec_id"), lit(2L)) === 1), kmeansArtifact(s, d))
      centroidsFromStats(statsA.unionByName(statsB)).localCheckpoint()
    }

  /** FULL-corpus sufficient statistics, PERSISTED once per (JVM, dir)
    * — the standing artifact the delete roll subtracts from (the
    * production shape: the stats parquet is maintained across rolls;
    * the corpus is never re-read to forget). */
  private[graft] def kmeansStatsFullDir(s: SparkSession, d: String): String =
    graft.Staging.onceDir(s, "km16_statsf", d) { p =>
      statsOf(VectorQueries.ivfCorpus(s, d), kmeansArtifact(s, d))
        .write.mode("overwrite").parquet(p)
    }

  /** The DELETED codebook: tombstone stats (one O(tombstones) pass
    * against the frozen codebook) SUBTRACTED from the re-read standing
    * artifact by negating (sv, cnt) into the same additive merge —
    * shared by the judged serve and KmeansSpec's
    * subtract-equals-rebuild gate. */
  private[graft] def deletedKmeansArtifact(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "km16_del", d) {
      val full = s.read.parquet(kmeansStatsFullDir(s, d))
      val tomb = statsOf(VectorQueries.ivfCorpus(s, d)
          .filter(pmod(col("vec_id"), lit(10L)) === 7), kmeansArtifact(s, d))
        .select(col("cluster"), col("pos"),
          negate(col("sv")).as("sv"), negate(col("cnt")).as("cnt"))
      centroidsFromStats(full.unionByName(tomb)).localCheckpoint()
    }

  /** Oracle CTEs of the REBUILD form: one more full-corpus Lloyd round
    * from the trained `c` (the kg/ks/kc template of
    * VectorQueries.lloydSql, instantiated at round 3), then assignment
    * against the updated `kc3`. */
  private def updateRoundSql: String = """,
      kg3 AS (SELECT vec_id, c_id AS cluster FROM (
                SELECT n.vec_id, c.c_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY
                  CAST(list_sum(list_transform(list_zip(n.q, c.cq), s -> s[1] * s[2])) AS DOUBLE)
                    / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, c.c_id) AS rn
                FROM n, c) WHERE rn = 1),
      ks3 AS (SELECT g.cluster, t.i AS pos, sum(n.q[t.i + 1]) AS sv, count(*) AS cnt
              FROM kg3 g JOIN n ON n.vec_id = g.vec_id CROSS JOIN range(0, 64) AS t(i)
              GROUP BY 1, 2),
      kc3 AS (SELECT c_id, cq, list_sum(list_transform(list_zip(cq, cq), s -> s[1] * s[2])) AS cn2
              FROM (SELECT cluster AS c_id,
                      list(CAST((sv - ((sv % cnt + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cq
                    FROM ks3 GROUP BY 1)),
      asg3 AS (SELECT vec_id, cluster FROM (
                SELECT a.vec_id, c.c_id AS cluster, row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  CAST(list_sum(list_transform(list_zip(a.q, c.cq), s -> s[1] * s[2])) AS DOUBLE)
                    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, c.c_id) AS rn
                FROM n a, kc3 c) WHERE rn = 1)"""

  /** Oracle CTEs of the delete roll's REBUILD form: the survivor slice
    * `nd`, one full Lloyd round over it from the trained `c`
    * (kgd/ksd/kcd — the kg/ks/kc template over survivors only), then
    * survivor assignment against the deleted codebook `kcd`. */
  private def deleteRoundSql: String = """,
      nd AS (SELECT * FROM n WHERE vec_id % 10 <> 7),
      kgd AS (SELECT vec_id, c_id AS cluster FROM (
                SELECT n.vec_id, c.c_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY
                  CAST(list_sum(list_transform(list_zip(n.q, c.cq), s -> s[1] * s[2])) AS DOUBLE)
                    / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, c.c_id) AS rn
                FROM nd n, c) WHERE rn = 1),
      ksd AS (SELECT g.cluster, t.i AS pos, sum(n.q[t.i + 1]) AS sv, count(*) AS cnt
              FROM kgd g JOIN nd n ON n.vec_id = g.vec_id CROSS JOIN range(0, 64) AS t(i)
              GROUP BY 1, 2),
      kcd AS (SELECT c_id, cq, list_sum(list_transform(list_zip(cq, cq), s -> s[1] * s[2])) AS cn2
              FROM (SELECT cluster AS c_id,
                      list(CAST((sv - ((sv % cnt + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cq
                    FROM ksd GROUP BY 1)),
      asgd AS (SELECT vec_id, cluster FROM (
                SELECT a.vec_id, c.c_id AS cluster, row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  CAST(list_sum(list_transform(list_zip(a.q, c.cq), s -> s[1] * s[2])) AS DOUBLE)
                    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, c.c_id) AS rn
                FROM nd a, kcd c) WHERE rn = 1)"""

  /** The full-corpus nearest-centroid assignment `(vec_id, cluster)`
    * off the shared codebook — built once per (JVM, dir) and shared by
    * the serve query and the cluster-budget consumer (the `ivf_asg`
    * discipline). */
  private[queries] def kmeansAssignment(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "km16_asg", d) {
      VectorQueries.ivfAssign(VectorQueries.ivfCorpus(s, d), kmeansArtifact(s, d))
        .localCheckpoint()
    }

  /** Oracle CTEs for the assignment, shared verbatim by
    * `vec_kmeans_assign` and `curate_cluster_budget`: `sim` + `asg`
    * off the trained `c`. */
  private def assignSql: String = """,
      sim AS (SELECT a.vec_id, c.c_id,
                CAST(list_sum(list_transform(list_zip(a.q, c.cq), s -> s[1] * s[2])) AS DOUBLE)
                  / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS csim
              FROM n a, c),
      asg AS (SELECT vec_id, cluster FROM
                (SELECT vec_id, c_id AS cluster,
                        row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rn
                 FROM sim)
              WHERE rn = 1)"""
}
