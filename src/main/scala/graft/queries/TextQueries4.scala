package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth text-pipeline batch: the two corpus-assembly passes that sit
  * AFTER dedup/quality filtering in a training-data build — benchmark
  * decontamination and sequence packing.
  */
object TextQueries4 {

  val defs: Seq[QueryDef] = Seq(

    /** Benchmark decontamination: flag training documents sharing any
      * token n-gram with a held-out eval set — the standard guard
      * against test-set leakage into a training corpus. The eval set is
      * a deterministic fixture subset (doc_id % 50 == 0); production
      * uses 8-13-gram overlap, this fixture's short near-random docs
      * need 3-grams to show signal. Shape at scale: the eval shingle
      * set is tiny next to the corpus (benchmarks are KBs, corpora are
      * TBs) so the probe join broadcasts — the train side never
      * shuffles on the shingle; the only exchange is the final per-doc
      * aggregate. Shingles are array_distinct'd per doc BEFORE the
      * join, so n_shared counts distinct leaked n-grams exactly. */
    QueryDef("doc_decontaminate", Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS g
             FROM t WHERE len(w) >= 3),
      e AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 50 <> 0)
      SELECT tr.doc_id, count(e.g) AS n_shared, count(e.g) > 0 AS contaminated
      FROM tr LEFT JOIN e ON tr.g = e.g
      GROUP BY 1 ORDER BY tr.doc_id""")) { (s, d) =>
      val n = 3
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= n)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("w")) - (n - 1)),
            i => array_join(slice(col("w"), i, lit(n)), " ")))).as("g"))
      val eval  = sh.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("g")).distinct().withColumn("hit", lit(1))
      val train = sh.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      train.join(broadcast(eval), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(col("hit")).as("n_shared"))
        .select(col("doc_id"), col("n_shared"),
          (col("n_shared") > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    },

    /** Sequence packing: concatenate documents in order and chop into
      * fixed token-budget packs (budget 256) — the batch-assembly step
      * that turns a curated corpus into training sequences. Packing is
      * PER LANGUAGE (each lang stream packs independently), which is
      * both the realistic sharding (models train on per-source/lang
      * mixtures) and the scale shape: the running-offset window
      * partitions by lang, so no single-partition global window —
      * at 100 TB the partition key would be the shard id and each
      * shard's window is independent. pack_id = floor(start / budget)
      * is the deterministic concatenate-and-chop assignment (a doc
      * straddling a boundary starts the pack it begins in); the final
      * per-pack rollup reports fill. All integer arithmetic — exact in
      * both engines. */
    QueryDef("doc_pack_sequences", Some("""
      WITH t AS (SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n
             FROM documents),
      w AS (SELECT lang, doc_id, n,
             COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             FROM t)
      SELECT lang, CAST(start // 256 AS BIGINT) AS pack_id,
             count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
             min(doc_id) AS first_doc
      FROM w GROUP BY 1, 2 ORDER BY lang, pack_id""")) { (s, d) =>
      val budget = 256
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("n"))
        .withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
        .groupBy(col("lang"), floor(col("start") / budget).as("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("pack_id"))
    },

    /** URL canonicalization + dedup classes — the web-corpus staple:
      * the same page arrives under many spellings (case-varied
      * scheme/host, www. prefix, default :80 port, trailing slash,
      * utm_* tracking params, #fragments) and must collapse to ONE
      * canonical key before content dedup even starts. The fixture
      * carries no URLs, so deterministic doc_id-derived messy URLs are
      * planted (both engines build the identical raw string — the
      * operator under test is the canonicalization chain itself):
      * 5 docs per canonical page across 100 pages. All per-row regexp
      * work (codegen'd, no lookaheads — RE2 parity with DuckDB) + one
      * map-side-combined aggregate; at 100 TB this runs at scan speed.
      * Chain order matters and is pinned on both sides: fragment →
      * tracking params → lowercase authority → www-strip → :80-strip
      * → trailing slash. */
    QueryDef("doc_url_canonical", Some("""
      WITH u AS (SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
        (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM:80' ELSE 'example.com' END) ||
        '/articles/item' || CAST(doc_id % 100 AS VARCHAR) ||
        (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END) ||
        (CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END) AS raw
        FROM documents),
      s1 AS (SELECT doc_id, regexp_replace(regexp_replace(raw, '#.*$', ''),
                    '\?utm_[A-Za-z_]+=[A-Za-z]+$', '') AS x FROM u),
      s2 AS (SELECT doc_id, lower(regexp_extract(x, '^[^/]*//[^/]*')) ||
                    regexp_replace(x, '^[^/]*//[^/]*', '') AS x FROM s1),
      s3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(x,
                    '//www\.', '//'), ':80/', '/'), '/$', '') AS url FROM s2)
      SELECT url, count(*) AS n_docs, min(doc_id) AS first_doc
      FROM s3 GROUP BY 1 ORDER BY 1""")) { (s, d) =>
      val raw = concat(
        when(pmod(col("doc_id"), lit(2)) === 0, "HTTP").otherwise("http"), lit("://"),
        when(pmod(col("doc_id"), lit(3)) === 0, "WWW.Example.COM:80").otherwise("example.com"),
        lit("/articles/item"), pmod(col("doc_id"), lit(100)).cast("string"),
        when(pmod(col("doc_id"), lit(5)) === 0, "/").otherwise(""),
        when(pmod(col("doc_id"), lit(4)) === 0, "?utm_source=feed").otherwise(""),
        when(pmod(col("doc_id"), lit(7)) === 0, "#sec2").otherwise(""))
      val x1 = regexp_replace(regexp_replace(raw, "#.*$", ""),
        "\\?utm_[A-Za-z_]+=[A-Za-z]+$", "")
      val x2 = concat(lower(regexp_extract(x1, "^[^/]*//[^/]*", 0)),
        regexp_replace(x1, "^[^/]*//[^/]*", ""))
      val url = regexp_replace(regexp_replace(regexp_replace(x2,
        "//www\\.", "//"), ":80/", "/"), "/$", "")
      Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("url"))
    },
  )
}
