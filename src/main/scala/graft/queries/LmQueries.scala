package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus-LM's train/serve lifecycle (round-15 verdict task 5):
  * `doc_lm_score` proves the CCNet-style bigram fluency gate in one
  * lineage; these queries complete it the way every other trained
  * artifact in the repo works (tokenizer triad, k-means, PCA,
  * containment/MinHash indexes) — the model persists to parquet ONCE
  * and a held-out batch is served from the RE-READ artifact, so
  * artifact serialization itself sits inside the hash gate.
  *
  * Splits follow the incremental-index convention
  * (dedup_containment_incremental): the standing corpus
  * (doc_id % 5 ≠ 0) trains the bigram table, the batch slice
  * (doc_id % 5 = 0) is scored against it. Serving a batch the model
  * has NOT seen forces the out-of-vocabulary contract the in-corpus
  * query never exercises: unseen bigrams score as misses (LEFT join,
  * counted in n_oov via n_bigrams − n_scored), the judged mean runs
  * over scored instances only, and an all-OOV doc reports the -1
  * sentinel rather than a NULL (exact-integer parity — no smoothing,
  * which would be a float).
  *
  * Scale shape: training is two corpus aggregates (c1, c2) and one
  * integer division — map-side-combined, written once; serving is ONE
  * bigram explode over the batch + a model join (broadcast at the
  * fixture's bounded vocab; web-scale vocab shuffle-joins on w1, the
  * doc_lm_score scaladoc's standing note) + one doc_id aggregate —
  * O(batch) per serve, the model never rebuilds. */
object LmQueries {

  /** The persisted bigram LM `(w1, w2, p_ppm)` trained on the standing
    * split, written ONCE per (JVM, dir) — p(w2|w1) as exact ppm under
    * truncating division, doc_lm_score's arithmetic verbatim. Returns
    * the artifact path. */
  private[graft] def sharedLmModel(s: SparkSession, d: String): String =
    graft.Staging.onceDir(s, "lm_model", d) { p =>
      val t = SharedText.tokenized(s, d)
        .filter(pmod(col("doc_id"), lit(5L)) =!= 0)
        .select(col("doc_id"), col("w"))
      val c1 = t.select(explode(col("w")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val c2 = bigrams(t).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      c2.join(c1, Seq("w1"))
        .withColumn("p_ppm", expr("(c2 * 1000000) div c1"))
        .select(col("w1"), col("w2"), col("p_ppm"))
        .write.mode("overwrite").parquet(p)
    }

  /** Per-doc bigram instances of one batch frame `(doc_id, w1, w2)`. */
  private def bigrams(batch: DataFrame): DataFrame =
    batch.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Score one batch frame against the frozen model — LEFT join keeps
    * OOV bigram instances in n_bigrams; the mean runs over scored
    * instances only; all-OOV docs report the -1 sentinel. */
  private[graft] def score(batch: DataFrame, model: DataFrame): DataFrame =
    bigrams(batch)
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("p_ppm")).as("n_scored"),
        sum(col("p_ppm")).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"), col("n_scored"),
        expr("CASE WHEN n_scored > 0 THEN sum_ppm div n_scored ELSE -1 END").as("lm_ppm"))

  /** Shared oracle: train on the standing split, serve the batch —
    * replayed end-to-end in SQL, so both the batch query (persisted
    * parquet round-trip) and the streaming twin (micro-batched serve)
    * must reproduce it bit-for-bit. */
  private val serveOracle = """
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      tr AS (SELECT * FROM t WHERE doc_id % 5 <> 0),
      c1 AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(w) AS w1 FROM tr) GROUP BY 1),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM
               (SELECT p.w1 AS w1, p.w2 AS w2
                FROM (SELECT unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]) AS p
                      FROM tr WHERE len(w) >= 2))
             GROUP BY 1, 2),
      model AS (SELECT c2.w1, c2.w2, (c2.c2 * 1000000) // c1.c1 AS p_ppm
                FROM c2 JOIN c1 ON c1.w1 = c2.w1),
      bq AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2
             FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]) AS p
                   FROM t WHERE doc_id % 5 = 0 AND len(w) >= 2)),
      sc AS (SELECT b.doc_id, m.p_ppm
             FROM bq b LEFT JOIN model m ON m.w1 = b.w1 AND m.w2 = b.w2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(p_ppm) AS BIGINT) AS n_scored,
             CAST(CASE WHEN count(p_ppm) > 0 THEN sum(p_ppm) // count(p_ppm) ELSE -1 END AS BIGINT) AS lm_ppm
      FROM sc GROUP BY doc_id ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef("doc_lm_score_persisted", Some(serveOracle)) { (s, d) =>
      val model = s.read.parquet(sharedLmModel(s, d))
      val batch = SharedText.tokenized(s, d)
        .filter(pmod(col("doc_id"), lit(5L)) === 0)
        .select(col("doc_id"), col("w"))
      score(batch, model).orderBy(col("doc_id"))
    },

    /** Streaming twin (stream_kmeans_assign's pattern): batch docs
      * arrive as a real file-source stream in two micro-batches, each
      * scored inside foreachBatch against the SAME frozen parquet
      * model with batch_id-keyed idempotent sinks. Scoring is a pure
      * per-doc function of the frozen model, so micro-batch boundaries
      * provably cannot change any score — the shared oracle's hash
      * gates exactly that (a batch scored against a retrained model,
      * a dropped batch, or cross-batch interference all break it).
      * At 100 TB: perplexity-filtering at ingest, O(batch) per
      * trigger, model cost zero after the one-time train. */
    QueryDef("stream_lm_score", Some(serveOracle)) { (s, d) =>
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.EventStreams
      val modelPath = sharedLmModel(s, d)
      val root = graft.Staging.dir("lmserve", d)
      val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.filter(pmod(col("doc_id"), lit(10L)) === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/in")
      docs.filter(pmod(col("doc_id"), lit(10L)) === 5)
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      val schema = s.read.parquet(s"$root/in").schema
      val sink = s"$root/out"
      EventStreams.withStreamConf(s) {
        EventStreams.awaitOrKill(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(s"$root/in")
            .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
              val model = b.sparkSession.read.parquet(modelPath)
              val tok = b.select(col("doc_id"), tokens(col("text")).as("w"))
              score(tok, model)
                .write.mode("overwrite").parquet(s"$sink/b$id")
              ()
            }
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow())
            .start(),
          "stream_lm_score")
      }
      // declared schema: a sink dir of an empty batch has no footers
      s.read.schema("doc_id LONG, n_bigrams LONG, n_scored LONG, lm_ppm LONG")
        .parquet(s"$sink/b*")
        .orderBy(col("doc_id"))
    }
  )
}
