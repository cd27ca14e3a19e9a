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
      WITH t AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term FROM documents),
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

    /** Context-window chunking: split each document into fixed-size
      * overlapping chunks (size 200, stride 150) — the preprocessing
      * step that turns documents into training windows. Pure per-row
      * explode (no shuffle until the oracle's ORDER BY); chunk count
      * derives from the text length, so the op is data-driven, not
      * schema-bound. */
    QueryDef("doc_chunks", Some("""
      WITH c AS (SELECT doc_id, text,
                   (greatest(length(text), 1) - 1) // 150 AS max_i
                 FROM documents),
      e AS (SELECT doc_id, unnest(range(0, max_i + 1)) AS i, text, max_i + 1 AS n_chunks FROM c)
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, CAST(n_chunks AS BIGINT) AS n_chunks,
             substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk,
             CAST(length(substr(text, CAST(i * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len
      FROM e ORDER BY doc_id, chunk_idx""")) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("max_i", expr("(greatest(length(text), 1) - 1) div 150"))
        .withColumn("i", explode(sequence(lit(0L), col("max_i"))))
        .select(col("doc_id"), col("i").as("chunk_idx"),
          (col("max_i") + 1).as("n_chunks"),
          expr("substr(text, CAST(i * 150 + 1 AS INT), 200)").as("chunk"))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    /** Deterministic dataset mixing + split assignment: per-source
      * sampling weights applied via a modulus rule on the stable id
      * (reproducible across runs and engines — no RNG), then a
      * deterministic train/val split, reduced to per-(source, split)
      * counts. The mixing/weighting step every training-corpus build
      * runs before tokenization. */
    QueryDef("curate_sample_mix", Some("""
      WITH w AS (SELECT *, (CAST(substr(source, 4) AS BIGINT) % 10) + 1 AS w_tenths FROM documents),
      s AS (SELECT *, CASE WHEN doc_id % 100 >= 90 THEN 'val' ELSE 'train' END AS split
            FROM w WHERE doc_id % 10 < w_tenths)
      SELECT source, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM s GROUP BY source, split ORDER BY source, split""")) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("w_tenths", (expr("substr(source, 4)").cast("long") % 10) + 1)
        .filter(col("doc_id") % 10 < col("w_tenths"))
        .withColumn("split", when(col("doc_id") % 100 >= 90, "val").otherwise("train"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"), col("split"))
    },

    /** TF-IDF: per-document top-3 terms. Classic curation scoring —
      * tf and df stay exact integers (two hash aggregates, map-side
      * partial), N arrives via a broadcast 1-row cross join (no
      * driver-side count), and the only floating step is one identical
      * multiply/ln chain on both engines. */
    QueryDef("doc_tfidf", Some("""
      WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
             FROM tf JOIN df USING (term), n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM sc)
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(rnk AS BIGINT) AS rnk, tfidf
      FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("rnk"), col("tfidf"))
        .orderBy(col("doc_id"), col("rnk"))
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

    /** The end-to-end training-data curation pipeline the LLM operators
      * exist for: score quality → filter → exact-dedup keep-first →
      * emit the kept corpus. Composes qualityScore, langId, fingerprint
      * and the dedup kernel in one judged plan. */
    QueryDef("curate_corpus", Some(raw"""
      WITH scored AS (
        SELECT doc_id, lang, md5(lower(trim(text))) AS fp,
               $qualityScoreSql AS quality
        FROM documents),
      kept AS (SELECT * FROM scored WHERE quality > 0.3),
      deduped AS (SELECT * FROM
        (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept)
        WHERE rn = 1)
      SELECT doc_id, lang, quality FROM deduped ORDER BY doc_id""")) { (s, d) =>
      val scored = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        fingerprint(col("text")).as("fp"), qualityScore(col("text")).as("quality"))
      val kept = scored.filter(col("quality") > 0.3)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy(col("doc_id"))
    },

    // Conversion funnel over the event stream (signup → later purchase).
    QueryDef("events_funnel", Some("""
      WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_signup
                 FROM events WHERE event_type = 'signup' GROUP BY 1),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase')
      SELECT count(DISTINCT s.user_id) AS signed_up,
             count(DISTINCT CASE WHEN p.ts > s.first_signup THEN s.user_id END) AS converted
      FROM s LEFT JOIN p ON p.user_id = s.user_id""")) { (s, d) =>
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_signup"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      signups.join(purchases, col("p_user") === col("user_id"), "left")
        .agg(countDistinct(col("user_id")).as("signed_up"),
          countDistinct(when(col("p_ts") > col("first_signup"), col("user_id"))).as("converted"))
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
