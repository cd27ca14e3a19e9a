package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fourth text-pipeline batch: the two corpus-assembly passes that sit
  * AFTER dedup/quality filtering in a training-data build — benchmark
  * decontamination and sequence packing.
  */
object TextQueries4 {

  /** Shared oracle of `doc_heavy_hitters` and its streaming twin
    * `stream_heavy_hitters`: both reduce to exact φ=1/31 frequent
    * tokens because the sketch only proposes candidates — the exact
    * confirmation pass decides membership in both. */
  private val heavyHittersOracle = """
      WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS token
                   FROM documents),
      tot AS (SELECT count(*) AS n FROM tok),
      c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
      SELECT token, CAST(cnt AS BIGINT) AS cnt
      FROM c, tot WHERE cnt * 31 > n ORDER BY cnt DESC, token"""

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
      // the distinct-3-gram posting list is the JVM-shared shingles3
      // artifact (round 13) — identical expression to the inline form
      // it replaces, also consumed by dedup_containment[_incremental]
      val sh = SharedText.shingles3(s, d)
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

    /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc
      * duplicate-word and duplicate-bigram fractions plus the top-gram
      * concentration, the standard quality gate against boilerplate /
      * degenerate generations in a training corpus. (The fixture docs
      * are single-line, so the word/bigram family stands in for
      * Gopher's line-level twins.)
      *
      * Scale shape: explode → count per (doc_id, gram) → per-doc stats.
      * Both aggregates are map-side-combined hash aggregates keyed by
      * (doc_id, gram) then doc_id — bounded state, no windows. The
      * tempting per-row alternative (higher-order fns building a
      * frequency map per document in one projection) is O(len²) per row
      * with Catalyst's immutable map updates — explode+agg is the shape
      * that survives 100 TB. Bigrams come from zip_with against the
      * tail-slice (null-padded last pair filtered out), so there's no
      * index-generation divergence between engines for 1-word docs
      * (Spark's sequence(1,0) counts DOWN — avoided entirely).
      *
      * All ratios are single int→double casts and one IEEE division —
      * bit-identical in DuckDB; flags derive from the already-coalesced
      * doubles on both sides. */
    QueryDef("doc_repetition", Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS ws FROM documents),
      wx AS (SELECT doc_id, unnest(ws) AS word FROM t),
      wc AS (SELECT doc_id, word, count(*) AS c FROM wx GROUP BY 1, 2),
      wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                        CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS top_w,
                        sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_w
                 FROM wc GROUP BY 1),
      bx AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                                                  i -> ws[i] || ' ' || ws[i + 1])) AS gram
             FROM t WHERE len(ws) >= 2),
      bc AS (SELECT doc_id, gram, count(*) AS c FROM bx GROUP BY 1, 2),
      bstats AS (SELECT doc_id, max(c) AS top_b, sum(c) AS n_b,
                        sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_b
                 FROM bc GROUP BY 1)
      SELECT w.doc_id, n_words,
             CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_word_ratio,
             CAST(top_w AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
             CAST(dup_w AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
             coalesce(CAST(top_b AS DOUBLE) / CAST(n_b AS DOUBLE), 0.0) AS top_bigram_frac,
             coalesce(CAST(dup_b AS DOUBLE) / CAST(n_b AS DOUBLE), 0.0) AS dup_bigram_frac,
             coalesce(CAST(top_b AS DOUBLE) / CAST(n_b AS DOUBLE), 0.0) >= 0.1
               OR coalesce(CAST(dup_b AS DOUBLE) / CAST(n_b AS DOUBLE), 0.0) >= 0.15
               AS repetitive
      FROM wstats w LEFT JOIN bstats b USING (doc_id)
      ORDER BY w.doc_id""")) { (s, d) =>
      val t = Tables.documents(s, d).select(col("doc_id"), tokens(col("text")).as("ws"))
      val wc = t.select(col("doc_id"), explode(col("ws")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      val wstats = wc.groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_w"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_w"))
      val bigrams = filter(
        zip_with(col("ws"), slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        g => g.isNotNull)
      val bc = t.select(col("doc_id"), explode(bigrams).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      val bstats = bc.groupBy(col("doc_id")).agg(
        max(col("c")).as("top_b"), sum(col("c")).as("n_b"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_b"))
      def ratio(n: Column, den: Column) = n.cast("double") / den.cast("double")
      val topBigram = coalesce(ratio(col("top_b"), col("n_b")), lit(0.0))
      val dupBigram = coalesce(ratio(col("dup_b"), col("n_b")), lit(0.0))
      wstats.join(bstats, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          ratio(col("n_distinct"), col("n_words")).as("distinct_word_ratio"),
          ratio(col("top_w"), col("n_words")).as("top_word_frac"),
          ratio(col("dup_w"), col("n_words")).as("dup_word_frac"),
          topBigram.as("top_bigram_frac"),
          dupBigram.as("dup_bigram_frac"),
          (topBigram >= 0.1 || dupBigram >= 0.15).as("repetitive"))
        .orderBy(col("doc_id"))
    },

    /** Temperature-based source mixing — the data-mixing step of every
      * LLM corpus recipe (Gopher/LLaMA style): small sources are
      * UPSAMPLED relative to their size so big crawls don't drown
      * curated sets. Contract (chosen to be exactly reproducible in
      * SQL): with α = 0.5, each source keeps
      * rate = min(1, β·sqrt(n_max/n_i)), β = 0.5 — flattening
      * proportional to n_i^(α−1), anchored on the LARGEST source so
      * no cross-source float accumulation exists (a normalized-Σ
      * formulation would sum doubles in engine-specific order and
      * flip boundary docs between engines; n_max is an exact
      * integer). The rate is quantized to millionths ONCE, then the
      * keep decision is pure integer arithmetic on the doc id (a
      * multiplicative-hash residue, overflow-free by reducing mod a
      * prime first) — bit-identical row membership in both engines.
      * The uniform fixture sources are folded into g0..g4 groups of
      * 25-175 docs so the dial actually spreads (g3 keeps 50%, g0
      * clamps at 100%).
      *
      * Scale shape: per-source stats are K rows (broadcast back);
      * the corpus-side pass is one scan + integer filter; one final
      * hash agg. No shuffle of the corpus at all. */
    QueryDef("curate_temperature_mix", Some("""
      WITH g AS (SELECT doc_id, n_chars,
                   'g' || CAST(CAST(floor(sqrt(CAST(substr(source, 4) AS DOUBLE))) AS BIGINT) AS VARCHAR) AS mix_src
                 FROM documents),
      c AS (SELECT mix_src, count(*) AS n_docs FROM g GROUP BY 1),
      r AS (SELECT mix_src, n_docs,
              CAST(floor(least(1.0, 0.5 * sqrt(CAST(max(n_docs) OVER () AS DOUBLE)
                                               / CAST(n_docs AS DOUBLE))) * 1000000) AS BIGINT)
                AS rate_millionths
            FROM c),
      k AS (SELECT g.mix_src, r.n_docs, r.rate_millionths, g.n_chars
            FROM g JOIN r USING (mix_src)
            WHERE ((g.doc_id % 1000003) * 746777) % 1000000 < r.rate_millionths)
      SELECT mix_src, n_docs, rate_millionths, count(*) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS kept_chars
      FROM k GROUP BY 1, 2, 3 ORDER BY 1""")) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
        concat(lit("g"), floor(sqrt(expr("substr(source, 4)").cast("double")))
          .cast("long").cast("string")).as("mix_src"))
      val counts = docs.groupBy(col("mix_src")).agg(count(lit(1)).as("n_docs"))
      val nmax = counts.agg(max(col("n_docs")).as("n_max"))
      val rates = counts.crossJoin(broadcast(nmax))
        .withColumn("rate_millionths",
          floor(least(lit(1.0), lit(0.5) * sqrt(col("n_max").cast("double")
            / col("n_docs").cast("double"))) * 1000000).cast("long"))
        .select(col("mix_src"), col("n_docs"), col("rate_millionths"))
      docs.join(broadcast(rates), Seq("mix_src"))
        .filter(pmod(pmod(col("doc_id"), lit(1000003L)) * 746777L, lit(1000000L))
          < col("rate_millionths"))
        .groupBy(col("mix_src"), col("n_docs"), col("rate_millionths"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("mix_src"))
    },

    /** The MinHash-LSH recall dial — `sim_ann_recall`'s twin for the
      * text-dedup family, and the probe that caught a real defect:
      * every 25th doc gets a planted near-duplicate (every 6th word
      * occurrence replaced by a position-unique marker → true token
      * Jaccard ≈ 0.6–0.7), the full judged pipeline
      * (TextQueries.minhashPairs — shared code, so the dial and the
      * index can never drift) runs over corpus ∪ planted, and each
      * planted pair reports whether the end-to-end dedup decision
      * (band collision AND est ≥ 0.5) recovered it. Under the
      * original affine-in-k hash family (ha + k·hb) this measured
      * recall 0 — the k-hashes weren't independent and est collapsed
      * to ~0.25 on true-J 0.64 pairs; the (a_k·x + b_k) mod p family
      * shipped in its place estimates them at 0.59–0.72. QueriesSpec
      * floor-asserts the measured recall. */
    QueryDef("dedup_minhash_recall", Some(s"""
      WITH planted AS (
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string([CASE WHEN i % 6 = 0 THEN 'zz' || CAST(i AS VARCHAR) ELSE w[i] END
                                for i in range(1, len(w) + 1)], ' ') AS text
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS w
              FROM documents WHERE doc_id % 25 = 0)),
      corpus AS (SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id, text FROM planted),
      ${TextQueries.minhashPairsSql("corpus")},
      truth AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
                FROM documents WHERE doc_id % 25 = 0)
      SELECT t.id_a AS doc_id,
             p.id_a IS NOT NULL AND p.est_jaccard >= 0.5 AS recovered,
             p.est_jaccard
      FROM truth t LEFT JOIN p ON p.id_a = t.id_a AND p.id_b = t.id_b
      ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(transform(tokens(col("text")), (w, i) =>
            when(pmod(i + 1, lit(6)) === 0, concat(lit("zz"), (i + 1).cast("string")))
              .otherwise(w)), " ").as("text"))
      val pairs = TextQueries.minhashPairs(docs.unionByName(planted))
      val truth = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
      truth.join(pairs, Seq("id_a", "id_b"), "left")
        .select(col("id_a").as("doc_id"),
          (col("est_jaccard").isNotNull && col("est_jaccard") >= 0.5).as("recovered"),
          col("est_jaccard"))
        .orderBy(col("doc_id"))
    },

    /** SimHash recall dial — same planted near-dups as
      * dedup_minhash_recall, against the judged SimHash pipeline
      * (TextQueries.simhashPairs, shared code). This dial is what
      * forced the round-7 blocking rebuild: under the original single
      * low-16-bit bucket, every planted pair PASSED the ham<=16
      * confirmation (true distances 4-13) but recall was 0.3 — the
      * pairs simply never met, having flipped a low bit. The 8x8-bit
      * banded blocking (pigeonhole: ham<=7 guarantees a clean band)
      * measures 1.0 on the same pairs. QueriesSpec floor-asserts. */
    QueryDef("dedup_simhash_recall", Some(s"""
      WITH planted AS (
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string([CASE WHEN i % 6 = 0 THEN 'zz' || CAST(i AS VARCHAR) ELSE w[i] END
                                for i in range(1, len(w) + 1)], ' ') AS text
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS w
              FROM documents WHERE doc_id % 25 = 0)),
      corpus AS (SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id, text FROM planted),
      ${TextQueries.simhashPairsSql("corpus")},
      truth AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
                FROM documents WHERE doc_id % 25 = 0)
      SELECT t.id_a AS doc_id,
             p.id_a IS NOT NULL AND p.hamming_dist <= 16 AS recovered,
             p.hamming_dist
      FROM truth t LEFT JOIN p ON p.id_a = t.id_a AND p.id_b = t.id_b
      ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(transform(tokens(col("text")), (w, i) =>
            when(pmod(i + 1, lit(6)) === 0, concat(lit("zz"), (i + 1).cast("string")))
              .otherwise(w)), " ").as("text"))
      val pairs = TextQueries.simhashPairs(docs.unionByName(planted))
      val truth = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
      truth.join(pairs, Seq("id_a", "id_b"), "left")
        .select(col("id_a").as("doc_id"),
          (col("hamming_dist").isNotNull && col("hamming_dist") <= 16).as("recovered"),
          col("hamming_dist"))
        .orderBy(col("doc_id"))
    },

    /** Deterministic stratified reservoir sample: k=20 docs per
      * language, selected by ranking on md5(doc_id) — a seeded uniform
      * draw per stratum that is reproducible across engines and runs
      * (the property a training-data sampler must have for ablation
      * reruns; Math.random-style reservoirs are not replayable).
      *
      * Scale shape: row_number <= k over (lang, md5) plans as
      * partial+final WindowGroupLimit — every map task keeps at most k
      * rows per language BEFORE the exchange (same pre-limit pattern
      * as events_top_paths), so per-stratum state is O(k) however
      * skewed the language distribution; no global sort, no full
      * shuffle of the corpus. */
    QueryDef("curate_reservoir", Some("""
      WITH r AS (SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                 FROM documents)
      SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
      FROM r WHERE rk <= 20 ORDER BY lang, rk""")) { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .orderBy(col("lang"), col("rk"))
    },

    /** φ-heavy hitters over the corpus token stream (φ = 1/31: every
      * token whose frequency exceeds N/31) via the two-pass sketch
      * shape that survives unbounded cardinality: pass 1 runs a
      * Misra-Gries sketch PER PARTITION ([[graft.operators.SketchOps
      * .misraGries]], k=30 counters — hard memory bound whatever the
      * vocabulary size) and unions the survivors into a candidate set
      * that provably contains every global heavy hitter (pigeonhole
      * over the per-partition guarantee); pass 2 broadcasts the
      * bounded candidate set, semi-joins the token stream, and counts
      * EXACTLY — so the judged output is precise although the sketch
      * is approximate, and the DuckDB oracle is a plain
      * GROUP BY/HAVING. The point at 100 TB: a straight
      * `groupBy(token).count` shuffles every distinct key (billions
      * for web-scale vocab); here the only aggregate keys are the
      * ≤ k·partitions candidates, and the stream itself never
      * shuffles. The fixture's near-uniform 31-word vocabulary
      * straddles the φ boundary, so the exact pass genuinely decides
      * membership (≈ half the vocab passes, half fails).
      * SketchOpsSpec covers the MG guarantee + memory bound on an
      * adversarial synthetic stream. */
    QueryDef("doc_heavy_hitters", Some(heavyHittersOracle)) { (s, d) =>
      import s.implicits._
      val tok = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
      // pass 1: bounded-memory candidate generation, zero shuffle of
      // the stream (the groupBy aggregates ≤ k rows per partition)
      val cand = tok.as[String]
        .mapPartitions(graft.operators.SketchOps.misraGries(30))
        .toDF("token", "mg_floor")
        .groupBy(col("token")).agg(max(col("mg_floor")).as("mg_floor"))
        .select(col("token"))
      // pass 2: exact confirmation — candidates broadcast, the stream
      // aggregates only candidate keys (map-side combined)
      val counts = tok.join(broadcast(cand), Seq("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val tot = tok.groupBy().agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(tot))
        .filter(col("cnt") * 31 > col("n"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    /** STREAMING heavy hitters — the sketch kept alive across
      * micro-batches in arbitrary state v2: documents arrive as a real
      * two-batch file stream, tokens hash-shard, and each shard runs
      * Misra-Gries inside a `transformWithState` MapState (≤ k=30
      * counters per shard — a HARD state bound however large the
      * vocabulary grows, the property that makes unbounded-cardinality
      * frequency tracking survivable in a long-running stream).
      * Because a shard owns ALL occurrences of its tokens, the MG
      * survival guarantee covers each token's full stream regardless
      * of arrival order or batch boundaries; the union of per-batch
      * snapshot emissions is a superset of the final counters, so the
      * exact confirmation pass (broadcast candidates, precise counts,
      * φ=1/31 threshold) yields the SAME answer as the batch operator
      * for ANY ingest order — which is why this query shares
      * `doc_heavy_hitters`' oracle verbatim, and why the hash gates
      * order-invariance itself. */
    QueryDef("stream_heavy_hitters", Some(heavyHittersOracle)) { (s, d) =>
      import s.implicits._
      import org.apache.hadoop.fs.Path
      import graft.streaming.{EventStreams, TransformStateOps}
      val root = graft.Staging.dir("shh", d)
      val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/in")
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      val schema = s.read.parquet(s"$root/in").schema
      val in = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
        .select(explode(tokens(col("text"))).as("token"))
        .select(pmod(xxhash64(col("token")), lit(8L)).as("shard"), col("token"))
        .as[TransformStateOps.TokIn]
      val snapshots = EventStreams.withStreamConf(s, extra = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
        EventStreams.runToBatch(s,
          TransformStateOps.shardSketch(in, 30).toDF(),
          s"graft_q_shh_${graft.Staging.suffix(d)}")
      }
      val cand = snapshots.select(col("token")).distinct()
      val tok = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
      val counts = tok.join(broadcast(cand), Seq("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val tot = tok.groupBy().agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(tot))
        .filter(col("cnt") * 31 > col("n"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    /** Corpus-LM fluency scoring (the CCNet-style quality gate: score
      * each document under a language model trained on the corpus
      * itself, keep the fluent tail) with a bigram MLE standing in for
      * KenLM, in EXACT ppm fixed-point: p(w2|w1) = c(w1,w2)/c(w1)
      * becomes `(c2 * 1e6) div c1` under truncating division, and the
      * judged score is the per-doc mean over bigram INSTANCES —
      * integer-exact on both engines, so a real perplexity-filter
      * pipeline shape gets full hash-gating (log-space perplexity
      * would rank identically per-bigram; the rational form keeps it
      * bit-deterministic, same discipline as text_bm25_topk /
      * graph_pagerank). Shape at scale: bigram extraction is one
      * index-transform over the token array (no self-join — same trick
      * as doc_ngrams); the count tables are corpus aggregates that
      * broadcast at bounded vocab (web vocab: shuffle-join on w1, the
      * stream already carries doc_id so scoring re-shuffles once). */
    QueryDef("doc_lm_score", Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      bgf AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2
              FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]) AS p
                    FROM t WHERE len(w) >= 2)),
      c1 AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(w) AS w1 FROM t) GROUP BY 1),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bgf GROUP BY 1, 2),
      sc AS (SELECT b.doc_id, (c2.c2 * 1000000) // c1.c1 AS p_ppm
             FROM bgf b JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
             JOIN c1 ON c1.w1 = b.w1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(p_ppm) // count(*) AS BIGINT) AS lm_ppm
      FROM sc GROUP BY doc_id ORDER BY doc_id""")) { (s, d) =>
      // shared tokenize prefix (round 13) — see SharedText
      val t = SharedText.tokenized(s, d).select(col("doc_id"), col("w"))
      val bgf = t.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val c1 = t.select(explode(col("w")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val c2 = bgf.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      bgf.join(broadcast(c2), Seq("w1", "w2"))
        .join(broadcast(c1), Seq("w1"))
        .withColumn("p_ppm", expr("(c2 * 1000000) div c1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_ppm) div count(1)").as("lm_ppm"))
        .orderBy(col("doc_id"))
    },

    /** CORPUS-ASSEMBLY CAPSTONE — the full curation chain a
      * training-data build actually runs, as ONE judged lineage:
      * quality gate (doc_quality's exact formula, > 0.3) → eval-set
      * exclusion (doc_id % 50 docs are benchmark, never train) → exact
      * dedup (fingerprint latest-wins, doc_quality survivors only) →
      * decontamination (drop any doc sharing a token 3-gram with the
      * eval set — the broadcast eval-shingle probe of
      * doc_decontaminate) → per-language sequence packing (256-token
      * concatenate-and-chop of doc_pack_sequences). Each stage's
      * mechanism is proven separately by its own judged query; this
      * query proves the COMPOSITION — staging boundaries, column
      * contracts, and the end-to-end row set — against one composed
      * oracle, so a semantics drift in any stage (a filter reordered
      * against dedup, eval docs leaking into packs, a contaminated doc
      * surviving) breaks the hash. Scale shape is the union of the
      * parts: scan-speed scoring, one fp shuffle, broadcast eval
      * shingles (benchmarks are KBs), per-lang windows — the corpus
      * never shuffles on a shingle and never self-joins. */
    QueryDef("curate_full_pipeline", Some(raw"""
      WITH t AS (SELECT doc_id, lang, text, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      scored AS (SELECT doc_id, lang, w, md5(lower(trim(text))) AS fp,
             $qualityScoreSql AS quality
        FROM t),
      kept AS (SELECT * FROM scored WHERE quality > 0.3 AND doc_id % 50 <> 0),
      ded AS (SELECT * FROM
        (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept)
        WHERE rn = 1),
      esh AS (SELECT DISTINCT unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS g
              FROM t WHERE doc_id % 50 = 0 AND len(w) >= 3),
      dsh AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS g
              FROM ded WHERE len(w) >= 3),
      contaminated AS (SELECT DISTINCT d.doc_id FROM dsh d JOIN esh e ON e.g = d.g),
      clean AS (SELECT ded.doc_id, ded.lang, CAST(len(ded.w) AS BIGINT) AS n
                FROM ded LEFT JOIN contaminated c ON c.doc_id = ded.doc_id
                WHERE c.doc_id IS NULL),
      wv AS (SELECT lang, doc_id, n,
               COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             FROM clean)
      SELECT lang, CAST(start // 256 AS BIGINT) AS pack_id, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens, min(doc_id) AS first_doc
      FROM wv GROUP BY 1, 2 ORDER BY lang, pack_id""")) { (s, d) =>
      import org.apache.spark.sql.DataFrame
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("w"))
      val scored = t.select(col("doc_id"), col("lang"), col("w"),
        fingerprint(col("text")).as("fp"), qualityScore(col("text")).as("quality"))
      val kept = scored.filter(col("quality") > 0.3 && pmod(col("doc_id"), lit(50)) =!= 0)
      val wDed = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val ded = kept.withColumn("rn", row_number().over(wDed))
        .filter(col("rn") === 1).drop("rn")
      def shingles(df: DataFrame): DataFrame = df.filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("w")) - 2),
            i => array_join(slice(col("w"), i, lit(3)), " ")))).as("g"))
      val esh = shingles(t.filter(pmod(col("doc_id"), lit(50)) === 0))
        .select(col("g")).distinct()
      val contaminated = shingles(ded).join(broadcast(esh), Seq("g"))
        .select(col("doc_id")).distinct()
      val clean = ded.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), size(col("w")).cast("long").as("n"))
      val wPack = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      clean.withColumn("start", coalesce(sum(col("n")).over(wPack), lit(0L)))
        .groupBy(col("lang"), floor(col("start") / 256).as("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("pack_id"))
    },
  )
}
