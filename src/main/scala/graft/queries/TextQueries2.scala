package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text analytics: per-language term frequencies and
  * event-to-dimension enrichment. */
object TextQueries2 {

  val defs: Seq[QueryDef] = Seq(

    // Top-k terms per language: explode → count → windowed top-k. At
    // scale: partial agg on (lang, term), then a per-lang top-k that
    // AQE keeps skew-balanced; no collect.
    QueryDef("doc_topk_terms", Some("""
      WITH t AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
      g AS (SELECT lang, term, count(*) AS n FROM t GROUP BY 1, 2),
      r AS (SELECT lang, term, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk FROM g)
      SELECT lang, term, n, CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 5 ORDER BY lang, rnk""")) { (s, d) =>
      val terms = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("term"))
      val counts = terms.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
      counts.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("lang"), col("term"), col("n"), col("rnk"))
        .orderBy(col("lang"), col("rnk"))
    },

    // Array scalar-function family over split word arrays.
    QueryDef("scalar_array", Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_parts,
             list_contains(string_split(lower(text), ' '), 'the') AS has_the,
             string_split(text, ' ')[1] AS first_word,
             string_split(text, ' ')[-1] AS last_word,
             array_to_string(string_split(text, ' ')[1:3], '_') AS head3
      FROM documents ORDER BY doc_id""")) { (s, d) =>
      val words = split(col("text"), " ")
      Tables.documents(s, d).select(col("doc_id"),
        size(words).cast("long").as("n_parts"),
        array_contains(split(lower(col("text")), " "), "the").as("has_the"),
        element_at(words, 1).as("first_word"),
        element_at(words, -1).as("last_word"),
        array_join(slice(words, 1, 3), "_").as("head3"))
        .orderBy(col("doc_id"))
    },

    // Event stream joined to the customer dimension (broadcast).
    QueryDef("events_user_segment", Some("""
      SELECT c_mktsegment, event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, d) =>
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },
  )
}
