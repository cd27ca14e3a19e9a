package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse retrieval over the documents corpus — the lexical-search
  * complement of the dense (`sim_*`) family: a training-data pipeline
  * ranks documents against probe queries for targeted curation,
  * retrieval-based dedup audits, and eval-set mining.
  *
  * BM25 (Robertson et al., TREC-3 Okapi) is scored in EXACT fixed-point
  * integer arithmetic so the ranking is bit-deterministic and fully
  * oracle-checkable (the repo's ppm discipline, same as
  * `graph_pagerank`): the idf log is replaced by its Robertson-
  * Sparck-Jones rational core w = (N − df + ½)/(df + ½) scaled to ppm
  * with truncating division — order-equivalent to the log form for
  * ranking within a term (monotone), and every division point is
  * mirrored operation-for-operation in the DuckDB oracle, so scores
  * match to the last integer. k1 = 1.2 and b = 0.75 enter as integer
  * centi-constants (120, 75); no floats anywhere.
  *
  * Scale shape: the query term list is tiny and broadcasts; tf/df/dl
  * are one map-side-combined aggregate pass each over the exploded
  * token stream; the per-(query, doc) score aggregates only MATCHED
  * postings (the semi-join against the broadcast term list prunes the
  * stream before any shuffle); top-10 per query is a row_number
  * window that plans as WindowGroupLimit — per-query state is O(10).
  * Int64 headroom: idf_ppm ≤ 1e6·(2N+1) and the term numerator
  * multiplies by tf·22000 — exact to N ≈ 4e5 corpora at fixture tf;
  * production at larger N drops the ppm scale a decade per 10× N
  * (the ranking only needs the RATIO precision, not the magnitude).
  */
object RetrievalQueries {

  /** Probe queries over the fixture vocabulary: (query_id, term). */
  private val bmQueries: Seq[(Long, String)] = Seq(
    0L -> "hash", 0L -> "join", 0L -> "table",
    1L -> "scan", 1L -> "filter", 1L -> "batch",
    2L -> "sort", 2L -> "merge", 2L -> "spark")

  private def bmQueriesSql: String =
    bmQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("text_bm25_topk", Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
                   FROM documents),
      dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      q(query_id, term) AS (VALUES $bmQueriesSql),
      dfq AS (SELECT t.term, count(*) AS df
              FROM tf t JOIN (SELECT DISTINCT term FROM q) s ON s.term = t.term
              GROUP BY 1),
      posting AS (SELECT q.query_id, t.doc_id, t.tf, d.df, l.dl, st.n_docs, st.total_len
                  FROM q JOIN tf t ON t.term = q.term
                  JOIN dfq d ON d.term = q.term
                  JOIN dl l ON l.doc_id = t.doc_id, stats st),
      term_scores AS (SELECT query_id, doc_id, tf,
                        (1000000 * (2 * (n_docs - df) + 1)) // (2 * df + 1) AS idf_ppm,
                        25 + (75 * dl * n_docs) // total_len AS bracket_c
                      FROM posting),
      sc AS (SELECT query_id, doc_id,
               sum((idf_ppm * tf * 22000) // (10000 * tf + 120 * bracket_c)) AS score_ppm
             FROM term_scores GROUP BY 1, 2),
      r AS (SELECT query_id, doc_id, score_ppm,
              row_number() OVER (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS rnk
            FROM sc)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             CAST(score_ppm AS BIGINT) AS score_ppm, CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""")) { (s, d) =>
      import s.implicits._
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val q = bmQueries.toDF("query_id", "term")
      val dfq = tf.join(broadcast(q.select("term").distinct()), Seq("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
      val posting = broadcast(q).join(tf, Seq("term"))
        .join(broadcast(dfq), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
      val scored = posting
        .withColumn("idf_ppm",
          expr("(1000000 * (2 * (n_docs - df) + 1)) div (2 * df + 1)"))
        .withColumn("bracket_c", expr("25 + (75 * dl * n_docs) div total_len"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(expr("(idf_ppm * tf * 22000) div (10000 * tf + 120 * bracket_c)"))
          .as("score_ppm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("query_id"), col("doc_id"), col("score_ppm"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }
  )
}
