package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Third text-pipeline batch: PII scrubbing and corpus n-gram counts —
  * two preprocessing passes every training-corpus build runs between
  * quality filtering and tokenization.
  */
object TextQueries3 {

  val defs: Seq[QueryDef] = Seq(

    /** Corpus-relative rarity scoring — the distributional quality
      * signal next to doc_quality's per-row heuristics: a document
      * whose tokens are mostly corpus-rare (count <= 2 across the
      * whole corpus) is likely gibberish/OOV-heavy, the classic
      * pre-training quality filter. Shape at scale: one map-side-
      * combined vocab aggregate, one equi-join of exploded tokens
      * against it (AQE broadcasts the vocab when it fits), one final
      * per-doc aggregate. Parity: counts are exact integers; the one
      * ratio divides the same two integers in double on both engines. */
    QueryDef("doc_rarity", Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS tok
                    FROM documents),
      cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
      j AS (SELECT t.doc_id, c.n FROM toks t JOIN cnt c USING (tok))
      SELECT doc_id, count(*) AS n_tokens,
             count(*) FILTER (WHERE n <= 2) AS n_rare,
             round(CAST(count(*) FILTER (WHERE n <= 2) AS DOUBLE) / count(*), 6) AS rare_ratio
      FROM j GROUP BY 1 ORDER BY doc_id""")) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      toks.join(vocab, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("n") <= 2, 1)).as("n_rare"))
        .select(col("doc_id"), col("n_tokens"), col("n_rare"),
          round(col("n_rare").cast("double") / col("n_tokens"), 6).as("rare_ratio"))
        .orderBy(col("doc_id"))
    },

    /** PII scrub: redact emails and phone numbers, count what was
      * found. The fixture corpus carries no PII, so the query first
      * plants deterministic doc_id-derived contact strings (both sides
      * build the identical augmented text) — the operator under test is
      * the scrub itself: global regexp_replace + regexp_extract_all
      * counts + a residual-PII guard. Pure per-row codegen'd work, no
      * shuffle before the ORDER BY; at 100 TB this runs at scan speed. */
    QueryDef("doc_pii_scrub", Some("""
      WITH aug AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' AS t
        FROM documents),
      s AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                              '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS scrubbed
        FROM aug)
      SELECT doc_id, n_emails, n_phones, right(scrubbed, 40) AS tail,
             regexp_matches(scrubbed, '@example\.com|\+1-555-') AS has_residual
      FROM s ORDER BY doc_id""")) { (s, d) =>
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "\\+1-555-[0-9]{4}"
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now.")).as("t"))
      val scrubbed = regexp_replace(
        regexp_replace(col("t"), lit(emailPat), lit("[EMAIL]")), lit(phonePat), lit("[PHONE]"))
      aug.select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phonePat), lit(0))).cast("long").as("n_phones"),
          scrubbed.as("scrubbed"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          expr("right(scrubbed, 40)").as("tail"),
          col("scrubbed").rlike("@example\\.com|\\+1-555-").as("has_residual"))
        .orderBy(col("doc_id"))
    },

    /** Corpus bigram counts, top-20: the n-gram statistics pass of a
      * language-model data pipeline. Index-explode over the token array
      * (i → w[i] ⧺ w[i+1]) instead of a self-join — one explode, one
      * hash aggregate with map-side partials, then TakeOrderedAndProject
      * for the top-k. At 100 TB the (bigram) aggregate is the only
      * shuffle and partial-aggregates away the long tail map-side. */
    QueryDef("doc_ngrams", Some("""
      WITH a AS (SELECT string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      e AS (SELECT w, unnest(range(1, len(w))) AS i FROM a WHERE len(w) >= 2),
      b AS (SELECT w[i] || ' ' || w[i + 1] AS bigram FROM e)
      SELECT bigram, count(*) AS n FROM b GROUP BY 1
      ORDER BY n DESC, bigram LIMIT 20""")) { (s, d) =>
      // shared tokenize prefix (round 13) — see SharedText
      val docs = SharedText.tokenized(s, d).select(col("w"))
        .filter(size(col("w")) >= 2)
      docs.withColumn("i", explode(sequence(lit(1), size(col("w")) - 1)))
        .select(concat_ws(" ",
          element_at(col("w"), col("i")),
          element_at(col("w"), col("i") + 1)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },
  )
}
