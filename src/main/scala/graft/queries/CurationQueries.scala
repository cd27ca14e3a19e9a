package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 corpus-curation operators: exact duplicated-substring span
  * detection (the Lee et al. 2021 "Deduplicating Training Data Makes
  * Language Models Better" dedup flavor — ExactSubstr — that the
  * shingle/MinHash family does not cover), a DEFLATE information-density
  * quality signal, and link-analysis rank over an interaction graph
  * (the host-graph quality prior of web-corpus pipelines, computed here
  * over the events fixture's transition graph).
  *
  * Scale shapes (100 TB): substring-span detection is one Generate +
  * ONE corpus-wide shuffle on the gram key + a per-doc local merge;
  * PageRank pays corpus-size cost only in edge EXTRACTION (one
  * window shuffle + one map-side-combined aggregate) — the iterations
  * run on the aggregated graph, which is broadcast-small relative to
  * the corpus exactly as web host-graphs are small relative to pages.
  */
object CurationQueries {

  /** Absolute path of the committed deflate fixture, derived from the
    * checkout location (round-11 advice: a hardcoded /root/repo literal
    * breaks the oracle on any other checkout path). `user.dir` is the
    * sbt/driver working directory — the repo root in every judged run —
    * and `-Dgraft.fixtures.dir` overrides it for exotic layouts. */
  private val deflateFixture: String = {
    val root = sys.props.getOrElse("graft.fixtures.dir",
      s"${sys.props("user.dir")}/fixtures")
    new java.io.File(s"$root/deflate_expected.parquet").getAbsolutePath
  }

  /** Duplicated-gram window length (characters). Lee et al. use 50
    * UTF-8 bytes on web corpora; 20 chars suits the ~300-char fixture
    * docs while keeping the same machinery. */
  private val K = 20

  /** Duplicated K-gram START positions `(doc_id, pos)` — the shared
    * kernel of span DETECTION and span REMOVAL (they cannot drift
    * apart). One Generate, then ONE corpus-wide shuffle on the gram
    * string for the occurrence count. */
  private def dupPositions(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= K,
            sequence(lit(1), length(col("text")) - lit(K - 1)))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("text").substr(col("pos").cast("int"), lit(K)).as("gram"))
      .select(col("doc_id"), col("pos"),
        count(lit(1)).over(Window.partitionBy(col("gram"))).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("doc_id"), col("pos"))

  /** The fixture corpus's duplicated-gram positions, computed ONCE per
    * JVM (round-12: `dedup_substring_spans` and `_removal` share this
    * kernel — one Generate + THE corpus gram shuffle — verbatim in
    * their oracles but each re-ran it Spark-side; pure function of
    * sfDir, so it is Staging.frame's contract, and the narrow
    * (doc_id, pos) rows make the checkpoint cheap). */
  private def fixtureDupPositions(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "dup_pos", d) {
      dupPositions(Tables.documents(s, d)).localCheckpoint()
    }

  /** Oracle-side twin of [[dupPositions]]: CTEs `g` (all positions) and
    * `d` (duplicated positions), shared verbatim by both substring
    * oracles. */
  private val DupPosSql: String = s"""
      g AS (
        SELECT doc_id, i AS pos, substr(text, CAST(i AS INT), $K) AS gram
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - ${K - 1} + 1)) AS i
              FROM documents) t
      ), d AS (
        SELECT doc_id, pos FROM
          (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n_occ FROM g)
        WHERE n_occ > 1
      )"""

  /** PageRank fixed-point scale: ranks are integer parts-per-million.
    * All arithmetic is bigint with truncating division (`div` here,
    * `//` in the DuckDB oracle — identical on the all-positive
    * operands), so the judged values are EXACT, not IEEE-order
    * dependent. Max intermediate: r(≤1e6) · 85 · w — far below 2^63. */
  private val Scale = 1000000L
  private val Iters = 3

  /** doc_quality's exact score formula — the stump learner's label
    * source, the package-level single copy (round-9 ADVICE hoist). */
  private val QualitySql: String = graft.queries.qualityScoreSql

  /** One micro-batch of the streaming curation service (factored out so
    * CurationSpec can REPLAY it): quality-gate → within-batch first-wins
    * dedup → anti-join against the standing index EXCLUDING this
    * batch's own index dir → batch_id-keyed overwrite of survivors +
    * their fingerprints. The self-exclusion is what makes checkpoint
    * replay a no-op: a crashed-and-replayed batch would otherwise find
    * its OWN fingerprints (written by the failed attempt) in the index,
    * anti-join everything away, and overwrite its curated dir with
    * nothing — silent data loss on exactly the path foreachBatch
    * retries. */
  private[graft] def curateBatch(root: String, b: DataFrame, id: Long): Unit = {
    import graft.functions.TextFunctions.{fingerprint, qualityScore}
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val firstInBatch = b
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        qualityScore(col("text")).as("quality"))
      .filter(col("quality") > 0.3)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val idx = b.sparkSession.read.schema("fp STRING")
      .parquet(s"$root/fpindex/b*")
      .withColumn("src", input_file_name())
      .filter(!col("src").contains(s"/b$id/")).drop("src")
    val fresh = firstInBatch.join(idx, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"), col("quality"))
      .localCheckpoint(true)   // one computation feeds both sinks
    fresh.write.mode("overwrite").parquet(s"$root/curated/b$id")
    fresh.select(col("fp")).write.mode("overwrite")
      .parquet(s"$root/fpindex/b$id")
  }

  /** Winnowing parameters (Schleimer et al., SIGMOD 2003 — the MOSS
    * fingerprinter): K-char grams, window of W consecutive gram hashes,
    * each window's minimum selected (rightmost on ties). Guarantee:
    * any common substring of length ≥ W + K − 1 shares a fingerprint. */
  private val WinK = 8
  private val WinW = 4

  /** Packing modulus for the (hash, rightmost-pos) argmin trick: comb =
    * h32 · 2³⁰ + (2³⁰ − 1 − pos) makes lexicographic (min hash, max
    * pos) a single BIGINT min — exact in both engines (h32 < 2³²,
    * comb < 2⁶²). pos < 2³⁰ is enforced by a per-row raise_error guard
    * in [[winnowFingerprints]] (a ≥1G-char document would otherwise
    * alias the packing SILENTLY — round-10 review finding). */
  private val WinM = 1073741824L

  /** Winnowing fingerprints `(doc_id, pos, fp)` over any
    * `(doc_id, text)` input — factored out so WinnowingSpec can drive
    * synthetic corpora through the exact judged kernel. */
  private[graft] def winnowFingerprints(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id"))
    val frame = byDoc.orderBy(col("pos")).rowsBetween(0, WinW - 1)
    docs
      .filter(length(col("text")) >= WinK)
      // loud guard: a document whose gram positions reach 2^30 would
      // corrupt the packed argmin, not fail — raise instead. The guard
      // lives INSIDE the generator's bound expression (round-11 nit:
      // wrapping the `text` column in the conditional let the carried
      // column re-evaluate the branch downstream of the Generate —
      // once per GRAM row; here it evaluates once per DOC row, and the
      // downstream substr/md5 read the raw attribute)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          when(length(col("text")).cast("long") >= lit(WinM),
            raise_error(concat(lit("winnowFingerprints: doc "), col("doc_id").cast("string"),
              lit(" exceeds the 2^30 position packing bound"))).cast("int"))
            .otherwise(length(col("text")) - lit(WinK - 1)))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        expr(s"CAST(conv(substr(md5(substr(text, CAST(pos AS INT), $WinK)), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .withColumn("comb", col("h") * WinM + (lit(WinM - 1) - col("pos")))
      .withColumn("n_grams", count(lit(1)).over(byDoc))
      .withColumn("win", min(col("comb")).over(frame))
      // only FULL windows select (the paper's definition): window
      // starts run to n_grams − W + 1; shrunken tail frames don't vote
      .filter(col("pos") <= col("n_grams") - lit(WinW - 1))
      .select(col("doc_id"), col("win")).distinct()
      .select(col("doc_id"),
        (lit(WinM - 1) - pmod(col("win"), lit(WinM))).as("pos"),
        expr(s"win div $WinM").as("fp"))
  }

  /** The fixture corpus's winnowing fingerprint frame
    * `(doc_id, pos, fp)`, computed ONCE per JVM (round-11 verdict
    * item 1: `doc_winnowing` and `dedup_winnowing` share this prefix
    * verbatim in their oracles but each rebuilt the gram-explode + two
    * windows Spark-side). Pure function of sfDir — Staging.frame's
    * contract; the build cost surfaces in Bench's `shared_staging`. */
  private def fixtureWinnowFps(s: SparkSession, d: String): DataFrame =
    graft.Staging.frame(s, "winnow_fps", d) {
      winnowFingerprints(Tables.documents(s, d)).localCheckpoint()
    }

  /** Shared oracle prefix of the winnowing family: CTE chain ending in
    * `s(doc_id, win)` — the selected packed fingerprints. */
  private val WinnowSql: String = s"""
      g AS (SELECT doc_id, i AS pos,
              ('0x' || substr(md5(substr(text, CAST(i AS INT), $WinK)), 1, 8))::BIGINT AS h
            FROM (SELECT doc_id, text, unnest(range(1, length(text) - ${WinK - 1} + 1)) AS i
                  FROM documents WHERE length(text) >= $WinK) t),
      c AS (SELECT doc_id, pos, h * $WinM + (${WinM - 1} - pos) AS comb,
              count(*) OVER (PARTITION BY doc_id) AS n_grams FROM g),
      w AS (SELECT doc_id, pos, n_grams,
              min(comb) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS win
            FROM c),
      s AS (SELECT DISTINCT doc_id, win FROM w WHERE pos <= n_grams - ${WinW - 1})"""

  /** Stop-gram bound: fingerprints present in more than this many docs
    * carry no dedup signal on a small-vocabulary corpus (the fixture's
    * hottest 8-gram reaches 328 docs at sf0.01) and would quadratically
    * blow the fp self-join — the idf-style pruning MOSS-family systems
    * apply in practice. */
  private val WinDf = 10

  val defs: Seq[QueryDef] = Seq(

    /** Winnowing-based near-dup detection — the DOWNSTREAM join the
      * doc_winnowing index exists for: docs sharing ≥ 2 rare selected
      * fingerprints pair up, scored by exact containment (shared /
      * min fingerprint count) in ppm integers. "Rare" = document
      * frequency ≤ $WinDf ([[WinDf]]): common grams on a
      * small-vocabulary corpus are stop-grams — zero dedup signal,
      * quadratic join cost — so both engines prune them identically
      * BEFORE the join (the idf move every MOSS-family deployment
      * makes). Scale shape: the fp equi-join's bucket sizes are
      * df-bounded ≤ $WinDf by construction — no capBuckets needed, no
      * degenerate bucket possible; the pair aggregate map-side
      * combines. */
    QueryDef("dedup_winnowing", Some(s"""
      WITH $WinnowSql,
      f AS (SELECT DISTINCT doc_id, win // $WinM AS fp FROM s),
      df AS (SELECT fp, count(*) AS dfreq FROM f GROUP BY 1),
      f2 AS (SELECT f.doc_id, f.fp FROM f JOIN df USING (fp) WHERE df.dfreq <= $WinDf),
      nf AS (SELECT doc_id, count(*) AS n_fp FROM f2 GROUP BY 1),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
             CAST((shared * 1000000) // least(na.n_fp, nb.n_fp) AS BIGINT) AS containment_ppm
      FROM p JOIN nf na ON na.doc_id = id_a JOIN nf nb ON nb.doc_id = id_b
      WHERE shared >= 2 ORDER BY id_a, id_b""")) { (s, d) =>
      val fps = fixtureWinnowFps(s, d)
        .select(col("doc_id"), col("fp")).distinct()
        .localCheckpoint() // feeds df-prune, counts, and both join sides
      val df = fps.groupBy(col("fp")).agg(count(lit(1)).as("dfreq"))
      val f2 = fps.join(df.filter(col("dfreq") <= WinDf).select("fp"), "fp")
      val nf = f2.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
      val a = f2.select(col("fp"), col("doc_id").as("id_a"))
      val b = f2.select(col("fp"), col("doc_id").as("id_b"))
      a.join(b, Seq("fp")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .join(nf.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")), "id_a")
        .join(nf.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("shared"),
          expr("(shared * 1000000) div least(n_a, n_b)").as("containment_ppm"))
        .orderBy(col("id_a"), col("id_b"))
    },

    /** The Gopher quality-rule battery (Rae et al. 2021, A1.1) —
      * the NAMED rule set web-corpus builds actually configure, judged
      * per document with every intermediate measurement exposed:
      * word-count bounds, mean word length in [3, 10] chars, ≥80% of
      * words containing an alphabetic character, ≥2 stopword hits, and
      * a symbol-to-word ratio (#/ellipsis) under 10% — thresholds
      * fixture-scaled where Gopher's assume web-page lengths (50 →
      * 5 minimum words), the mechanism identical. Ratios are exact ppm
      * integers under truncating division (mirrored `div`//`//`), so
      * every flag — and the composed gopher_pass — is bit-deterministic.
      * Complements doc_quality (a continuous score) with the
      * interpretable hard-gate battery production filters chain; runs
      * at scan speed (per-row HOFs + one regexp count, zero shuffles
      * before the output sort). */
    QueryDef("doc_gopher_rules", Some("""
      WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      m AS (SELECT doc_id,
              CAST(len(w) AS BIGINT) AS n_words,
              CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
              CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
              CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|for|with|on|at)\b')) AS BIGINT) AS stop_hits,
              CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS syms
            FROM t),
      r AS (SELECT doc_id, n_words,
              (sum_len * 1000000) // greatest(n_words, 1) AS mwl_ppm,
              (alpha_words * 1000000) // greatest(n_words, 1) AS alpha_ppm,
              stop_hits,
              (syms * 1000000) // greatest(n_words, 1) AS sym_ppm
            FROM m)
      SELECT doc_id, n_words, mwl_ppm, alpha_ppm, stop_hits, sym_ppm,
             n_words BETWEEN 5 AND 1000 AS ok_words,
             mwl_ppm BETWEEN 3000000 AND 10000000 AS ok_mwl,
             alpha_ppm > 800000 AS ok_alpha,
             stop_hits >= 2 AS ok_stop,
             sym_ppm < 100000 AS ok_sym,
             (n_words BETWEEN 5 AND 1000) AND (mwl_ppm BETWEEN 3000000 AND 10000000)
               AND alpha_ppm > 800000 AND stop_hits >= 2 AND sym_ppm < 100000 AS gopher_pass
      FROM r ORDER BY doc_id""")) { (s, d) =>
      import graft.functions.TextFunctions.{tokens, stopwordHits}
      val w = tokens(col("text"))
      val m = Tables.documents(s, d).select(col("doc_id"),
        size(w).cast("long").as("n_words"),
        aggregate(transform(w, x => length(x).cast("long")), lit(0L), (a, x) => a + x).as("sum_len"),
        size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long").as("alpha_words"),
        stopwordHits(col("text")).as("stop_hits"),
        regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long").as("syms"))
      val r = m.select(col("doc_id"), col("n_words"),
        expr("(sum_len * 1000000) div greatest(n_words, 1)").as("mwl_ppm"),
        expr("(alpha_words * 1000000) div greatest(n_words, 1)").as("alpha_ppm"),
        col("stop_hits"),
        expr("(syms * 1000000) div greatest(n_words, 1)").as("sym_ppm"))
      val okWords = col("n_words").between(5, 1000)
      val okMwl = col("mwl_ppm").between(3000000, 10000000)
      val okAlpha = col("alpha_ppm") > 800000
      val okStop = col("stop_hits") >= 2
      val okSym = col("sym_ppm") < 100000
      r.select(col("doc_id"), col("n_words"), col("mwl_ppm"), col("alpha_ppm"),
          col("stop_hits"), col("sym_ppm"),
          okWords.as("ok_words"), okMwl.as("ok_mwl"), okAlpha.as("ok_alpha"),
          okStop.as("ok_stop"), okSym.as("ok_sym"),
          (okWords && okMwl && okAlpha && okStop && okSym).as("gopher_pass"))
        .orderBy(col("doc_id"))
    },

    /** Balanced training-shard writer — the LAST MILE of a corpus
      * build: curated documents land in N=8 equal shards (the files a
      * training job's data loader round-robins over), written as a
      * shard-partitioned parquet layout and JUDGED FROM THE READ-BACK,
      * so the committed artifact — not the in-memory frame — is what
      * the oracle checks. Shard = ((doc_id mod (2³¹−1)) · 2654435761)
      * mod (2³¹−1) mod 8: multiplicative mixing decorrelates shard
      * from any doc_id stride (a plain doc_id % 8 would alias every
      * modulo convention the corpus pipeline already uses — eval
      * slices, batch slices). The doc_id is reduced mod 2³¹−1 BEFORE
      * the multiply (round-10 advice): the product then tops out at
      * (2³¹−2)·2654435761 ≈ 5.7e18 < 2⁶³, so the arithmetic is
      * engine-portable exact int64 at ANY doc_id — the unreduced
      * form overflowed (ANSI: threw) past doc_id ≈ 3.47e9, i.e. at
      * exactly the 100 TB corpus sizes the shard writer exists for.
      * (Ids differing by a multiple of 2³¹−1 share a shard — harmless
      * for an 8-way balance split.) Reduction is the identity for
      * every fixture id, so judged values are unchanged. Measures
      * 64/62 max/min docs per shard on the fixture
      * (ShardSpec asserts the balance). Judged per shard: doc count,
      * exact char sum, id range, and an order-free membership checksum
      * (sum of doc_id·31 + shard) so a row landing in the wrong shard
      * breaks the hash even if counts balance.
      *
      * Scale: assignment is a scan-speed projection; the write is the
      * one shuffle (partitionBy on 8 values — at 100 TB you'd add a
      * within-shard file-count key, the same layout IngestOps'
      * partitioned sink proves); the read-back aggregate map-side
      * combines to 8 rows. */
    QueryDef("curate_shard_writer", Some("""
      WITH sh AS (SELECT doc_id, n_chars,
                    ((doc_id % 2147483647) * 2654435761) % 2147483647 % 8 AS shard
                  FROM documents)
      SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             min(doc_id) AS min_id, max(doc_id) AS max_id,
             CAST(sum(doc_id * 31 + shard) AS BIGINT) AS id_checksum
      FROM sh GROUP BY 1 ORDER BY 1""")) { (s, d) =>
      val out = graft.Staging.dir("shards", d)
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          expr("((doc_id % 2147483647) * 2654435761) % 2147483647 % 8").as("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      s.read.parquet(out)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(col("doc_id") * 31 + col("shard")).cast("long").as("id_checksum"))
        .orderBy(col("shard"))
    },

    /** Winnowing document fingerprinting (Schleimer, Wilkerson & Aiken,
      * SIGMOD 2003 — the algorithm behind MOSS): hash every K-gram,
      * slide a W-hash window, keep each window's minimum (rightmost on
      * ties), emit the distinct selected (position, hash) pairs. The
      * LOCAL fingerprint family member beside doc_fingerprint's global
      * hash and dedup_substring's exhaustive positions: winnowing
      * guarantees any shared substring of length ≥ W+K−1 surfaces a
      * common fingerprint while storing only ~2/(W+1) of positions —
      * the storage/recall dial plagiarism and near-dup systems deploy.
      *
      * Exactness: the per-window argmin with rightmost tie-break packs
      * into ONE integer min (comb = h·2³⁰ + (2³⁰−1−pos)) — no
      * engine-specific arg_min/min_by tie behavior anywhere; md5-derived
      * 32-bit gram hashes are identical in both engines, so the oracle
      * replays the pipeline CTE-for-CTE and the selected set is
      * hash-gated exactly.
      *
      * Scale: one Generate + two doc-partitioned windows (count + frame
      * min) on the SAME doc_id shuffle, then a distinct on the selected
      * set — per-doc state is O(text length), never corpus-wide; the
      * fingerprint index this emits is what the banded dedup joins
      * consume downstream. */
    QueryDef("doc_winnowing", Some(s"""
      WITH $WinnowSql
      SELECT doc_id, CAST(${WinM - 1} - (win % $WinM) AS BIGINT) AS pos,
             CAST(win // $WinM AS BIGINT) AS fp
      FROM s ORDER BY doc_id, pos""")) { (s, d) =>
      fixtureWinnowFps(s, d)
        .orderBy(col("doc_id"), col("pos"))
    },

    /** Corpus DRIFT monitoring — the statistical-process-control step of
      * corpus maintenance: compare the incoming crawl batch's unigram
      * distribution (the doc_id % 5 = 0 slice, per the fixture's batch
      * convention) against the standing reference (the rest), flag the
      * most-drifted tokens, and report the aggregate distance. Both
      * judged statistics are EXACT integer rationals so the hash gate
      * carries no IEEE noise: per-token chi-square contribution
      * ((p−q)²·10⁶ div q, add-one-smoothed ppm probabilities over the
      * joint vocabulary — max intermediate 10¹⁸ < 2⁶³) and the
      * corpus-level total-variation distance (Σ|p−q| div 2). KL — the
      * textbook choice — needs ln(); chi-square ranks the same heavy
      * drifters without leaving integer arithmetic (the log-based
      * sibling of this trade is doc_dsir_weights' ratio).
      *
      * Scale shape: two map-side-combined token counts, a vocab-sized
      * full outer join, and totals via one broadcast row. The ranking
      * runs through [[ScaleOps.globalRank]] — at web scale the vocab
      * frame is millions of rows, and the distributed rank keeps the
      * top-k selection free of any single-partition window, same as
      * events_rfm's quintiles. */
    QueryDef("curate_drift_stats", Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS tok
                    FROM documents),
      cb AS (SELECT tok, count(*) AS c_b FROM toks WHERE doc_id % 5 = 0 GROUP BY 1),
      cr AS (SELECT tok, count(*) AS c_r FROM toks WHERE doc_id % 5 <> 0 GROUP BY 1),
      tot AS (SELECT count(*) FILTER (WHERE doc_id % 5 = 0) AS t_b,
                     count(*) FILTER (WHERE doc_id % 5 <> 0) AS t_r,
                     count(DISTINCT tok) AS v FROM toks),
      j AS (SELECT coalesce(cb.tok, cr.tok) AS tok,
                   coalesce(c_b, 0) AS c_b, coalesce(c_r, 0) AS c_r
            FROM cb FULL OUTER JOIN cr ON cb.tok = cr.tok),
      pq AS (SELECT tok,
               ((c_b + 1) * 1000000) // (tot.t_b + tot.v) AS p_ppm,
               ((c_r + 1) * 1000000) // (tot.t_r + tot.v) AS q_ppm
             FROM j, tot),
      st AS (SELECT tok, p_ppm, q_ppm, p_ppm - q_ppm AS diff_ppm,
               ((p_ppm - q_ppm) * (p_ppm - q_ppm) * 1000000) // greatest(q_ppm, 1) AS chi2_ppm,
               (sum(abs(p_ppm - q_ppm)) OVER ()) // 2 AS tvd_ppm
             FROM pq),
      rk AS (SELECT *, row_number() OVER (ORDER BY chi2_ppm DESC, tok) AS rnk FROM st)
      SELECT tok, CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
             CAST(diff_ppm AS BIGINT) AS diff_ppm, CAST(chi2_ppm AS BIGINT) AS chi2_ppm,
             CAST(tvd_ppm AS BIGINT) AS tvd_ppm, CAST(rnk AS BIGINT) AS rnk
      FROM rk WHERE rnk <= 20 ORDER BY rnk""")) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val isBatch = pmod(col("doc_id"), lit(5)) === 0
      val cb = toks.filter(isBatch).groupBy(col("tok")).agg(count(lit(1)).as("c_b"))
      val cr = toks.filter(!isBatch).groupBy(col("tok")).agg(count(lit(1)).as("c_r"))
      val tot = toks.agg(count(when(isBatch, 1)).as("t_b"),
        count(when(!isBatch, 1)).as("t_r"), countDistinct(col("tok")).as("v"))
      val pq = cb.join(cr, Seq("tok"), "full_outer")
        .select(col("tok"), coalesce(col("c_b"), lit(0L)).as("c_b"),
          coalesce(col("c_r"), lit(0L)).as("c_r"))
        .crossJoin(broadcast(tot))
        .select(col("tok"),
          expr("((c_b + 1) * 1000000) div (t_b + v)").as("p_ppm"),
          expr("((c_r + 1) * 1000000) div (t_r + v)").as("q_ppm"))
        // one materialization feeds the TVD aggregate, the per-token
        // frame, and the rank — without it the token explode + counts
        // + full-outer join re-derive per consumer (vocab-size frame)
        .localCheckpoint()
      // greatest(q_ppm, 1): at web-scale vocabularies (t_r + v > 10^6)
      // a reference-absent token's smoothed q_ppm truncates to 0 — the
      // floor keeps the chi2 ranking finite and ANSI-safe in both
      // engines instead of dividing by zero (round-10 review finding;
      // unreachable on the fixture, where q_ppm >= 1 always)
      val chi2 = expr("((p_ppm - q_ppm) * (p_ppm - q_ppm) * 1000000) div greatest(q_ppm, 1)")
      val tvd = pq.agg((sum(abs(col("p_ppm") - col("q_ppm"))) / 2).cast("long").as("tvd_ppm"))
      val st = pq
        .select(col("tok"), col("p_ppm"), col("q_ppm"),
          (col("p_ppm") - col("q_ppm")).as("diff_ppm"), chi2.as("chi2_ppm"))
        .crossJoin(broadcast(tvd))
      graft.operators.ScaleOps.globalRank(st, "__rk0", col("chi2_ppm").desc, col("tok"))
        .withColumn("rnk", col("__rk0") + 1).drop("__rk0")
        .filter(col("rnk") <= 20)
        .select(col("tok"), col("p_ppm"), col("q_ppm"), col("diff_ppm"),
          col("chi2_ppm"), col("tvd_ppm"), col("rnk"))
        .orderBy(col("rnk"))
    },

    // ExactSubstr dedup (Lee et al. 2021): maximal character spans that
    // occur more than once in the corpus (across OR within documents —
    // self-repetition is duplication too, per the paper). Mechanism:
    // every doc position opens a K-char gram; a gram occurring >1 time
    // marks its position duplicated; runs of consecutive duplicated
    // positions merge to maximal spans [min_pos, max_pos + K - 1].
    //
    // Plan shape: one Generate (positions), one shuffle on the gram
    // string (the corpus-wide occurrence count — THE unavoidable cost,
    // linear in total characters; the suffix-array formulation pays the
    // same bytes), then a doc_id window whose hash partitioning also
    // satisfies the (doc_id, grp) island aggregate — no further
    // shuffle. At 100 TB the gram key would carry xxhash64(gram)
    // (8-byte vs 20-byte shuffle width, collision-confirmed within
    // bucket); here the exact string keeps DuckDB-oracle parity.
    QueryDef("dedup_substring_spans", Some(s"""
      WITH $DupPosSql, isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d
      )
      SELECT doc_id, min(pos) AS span_start, max(pos) + ${K - 1} AS span_end,
             max(pos) + ${K - 1} - min(pos) + 1 AS span_len
      FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""")) { (s, d) =>
      // gaps-and-islands: consecutive duplicated positions share
      // pos - row_number(); hash partitioning on doc_id from the window
      // already satisfies the (doc_id, grp) aggregate — no new shuffle.
      fixtureDupPositions(s, d)
        .withColumn("grp", col("pos") -
          row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + lit(K - 1)).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_len"))
        .orderBy(col("doc_id"), col("span_start"))
    },

    // ExactSubstr REMOVAL — the second half of the Lee et al. operator:
    // excise every duplicated region and emit the cleaned text. The
    // removal set is the COVERAGE union of duplicated K-grams (each
    // duplicated start position covers [pos, pos+K-1]; positions gap
    // ≤ K merge into one region — note this differs from the detection
    // query's maximal-run islands, whose spans may overlap), so
    // removals never double-count. Cleaned text is reassembled from
    // the surviving segments with an order-pinned concat — string
    // equality is hash-gated against the oracle, so the rebuild is
    // judged byte-for-byte.
    //
    // Scale: the kernel is the shared dupPositions shuffle; everything
    // after is doc-local windows plus a per-doc aggregate whose state
    // is O(regions per doc), never O(corpus).
    QueryDef("dedup_substring_removal", Some(s"""
      WITH $DupPosSql, m0 AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $K
                    THEN 0 ELSE 1 END AS brk
        FROM d
      ), mg AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        FROM m0
      ), merged AS (
        SELECT doc_id, min(pos) AS m_start, max(pos) + ${K - 1} AS m_end
        FROM mg GROUP BY doc_id, grp
      ), pre AS (
        SELECT doc_id,
               coalesce(lag(m_end) OVER (PARTITION BY doc_id ORDER BY m_start), 0) + 1 AS s,
               m_start - 1 AS e
        FROM merged
      ), tails AS (
        SELECT t.doc_id, t.s, CAST(length(dd.text) AS BIGINT) AS e
        FROM (SELECT doc_id, max(m_end) + 1 AS s FROM merged GROUP BY doc_id) t
        JOIN documents dd USING (doc_id)
      ), segs AS (
        SELECT doc_id, s, e FROM pre WHERE e >= s
        UNION ALL
        SELECT doc_id, s, e FROM tails WHERE e >= s
      ), agg AS (
        SELECT sg.doc_id,
               string_agg(substr(dd.text, CAST(sg.s AS INT), CAST(sg.e - sg.s + 1 AS INT)),
                          '' ORDER BY sg.s) AS cleaned
        FROM segs sg JOIN documents dd USING (doc_id) GROUP BY sg.doc_id
      ), stats AS (
        SELECT doc_id, count(*) AS n_regions,
               CAST(sum(m_end - m_start + 1) AS BIGINT) AS removed_chars
        FROM merged GROUP BY doc_id
      )
      SELECT dd.doc_id,
             CAST(coalesce(st.n_regions, 0) AS BIGINT) AS n_regions,
             CAST(coalesce(st.removed_chars, 0) AS BIGINT) AS removed_chars,
             CASE WHEN st.doc_id IS NULL THEN dd.text ELSE coalesce(a.cleaned, '') END AS cleaned_text,
             CAST(length(CASE WHEN st.doc_id IS NULL THEN dd.text
                              ELSE coalesce(a.cleaned, '') END) AS BIGINT) AS cleaned_len
      FROM documents dd
      LEFT JOIN stats st ON st.doc_id = dd.doc_id
      LEFT JOIN agg a ON a.doc_id = dd.doc_id
      ORDER BY dd.doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val merged = fixtureDupPositions(s, d)
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(byPos) <= K, lit(0)).otherwise(lit(1)))
        .withColumn("grp",
          sum(col("brk")).over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).as("m_start"), (max(col("pos")) + lit(K - 1)).as("m_end"))
      val byStart = Window.partitionBy(col("doc_id")).orderBy(col("m_start"))
      val pre = merged
        .select(col("doc_id"),
          (coalesce(lag(col("m_end"), 1).over(byStart), lit(0L)) + 1).as("s"),
          (col("m_start") - 1).as("e"))
        .filter(col("e") >= col("s"))
      val tails = merged.groupBy(col("doc_id"))
        .agg((max(col("m_end")) + 1).as("s"))
        .join(docs, "doc_id")
        .select(col("doc_id"), col("s"), length(col("text")).cast("long").as("e"))
        .filter(col("e") >= col("s"))
      val cleaned = pre.unionByName(tails)
        .join(docs, "doc_id")
        .select(col("doc_id"), col("s"),
          col("text").substr(col("s").cast("int"), (col("e") - col("s") + 1).cast("int")).as("seg"))
        .groupBy(col("doc_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("s"), col("seg")))),
            x => x.getField("seg")), "").as("cleaned"))
      val stats = merged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_regions"),
          sum(col("m_end") - col("m_start") + 1).as("removed_chars"))
      docs
        .join(stats, Seq("doc_id"), "left")
        .join(cleaned, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_regions"), lit(0L)).as("n_regions"),
          coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
          when(col("n_regions").isNull, col("text"))
            .otherwise(coalesce(col("cleaned"), lit(""))).as("cleaned_text"))
        .withColumn("cleaned_len", length(col("cleaned_text")).cast("long"))
        .orderBy(col("doc_id"))
    },

    // DEFLATE information-density quality signal, FULLY hash-gated
    // since round 11: no SQL engine exposes zlib, so the oracle joins
    // a committed fixture (fixtures/deflate_expected.parquet, built by
    // tools/gen_deflate_fixture.py with PYTHON'S zlib at the same
    // pinned parameters — raw deflate, level 6 — and keyed by
    // md5(text) so one fixture serves every scale factor) while the
    // engine computes the length LIVE through the codegen'd
    // DeflatedLength expression (java.util.zip.Deflater(6, nowrap)).
    // Two independent DEFLATE implementations agreeing byte-for-byte
    // on output length IS the gate (CompressionKit.assertZlibParity
    // fails fast if this JVM's Deflater is not classic-zlib-parity);
    // bounds/monotonicity stay spec-asserted in CurationSpec. The
    // ratio is exact-integer ppm (truncating div both engines share),
    // not a rounded double — no float-rounding parity surface. The
    // whole pipeline is one codegen'd projection over the scan. The
    // fixture path derives from the working directory (overridable via
    // -Dgraft.fixtures.dir) so the oracle survives a checkout anywhere.
    QueryDef("doc_compression_ratio", Some(s"""
      SELECT d.doc_id, d.n_chars, f.deflated_len,
             (f.deflated_len * 1000000) // octet_length(encode(d.text)) AS ratio_ppm,
             CASE WHEN (f.deflated_len * 1000000) // octet_length(encode(d.text)) < 350000
                    THEN 'highly_repetitive'
                  WHEN (f.deflated_len * 1000000) // octet_length(encode(d.text)) < 550000
                    THEN 'repetitive'
                  ELSE 'natural' END AS density_class
      FROM documents d
      JOIN read_parquet('$deflateFixture') f
        ON md5(d.text) = f.text_md5
      ORDER BY d.doc_id""")) { (s, d) =>
      graft.expressions.CompressionKit.assertZlibParity()
      val deflated = graft.functions.TextFunctions.deflatedLen(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          deflated.as("deflated_len"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .withColumn("ratio_ppm", expr("(deflated_len * 1000000) div n_bytes"))
        .drop("n_bytes")
        .withColumn("density_class",
          when(col("ratio_ppm") < 350000L, "highly_repetitive")
            .when(col("ratio_ppm") < 550000L, "repetitive")
            .otherwise("natural"))
        .orderBy(col("doc_id"))
    },

    // Weighted PageRank over the event-type transition graph: nodes are
    // event types, edge u→v weighted by how often v follows u in a
    // user's timeline (lead() per user on (ts, event_id) — a total
    // order, so the edge multiset is deterministic). This is the
    // host-graph quality prior of web-corpus curation (rank domains,
    // filter low-rank ones) computed on the fixture's interaction data.
    //
    // Fixed-point integer arithmetic end to end (parts-per-million,
    // truncating division on both engines) makes 3 damped iterations
    // (d = 0.85) exactly reproducible — no IEEE summation-order drift.
    // Dangling mass is dropped, not redistributed (documented
    // simplification; every fixture node has out-edges anyway).
    //
    // Scale: the lead() window shuffles the corpus once on user; the
    // transition aggregate is map-side combined down to |types|² rows;
    // iterations touch ONLY that aggregated graph (broadcast joins) —
    // at web scale the host graph's millions of nodes are still
    // broadcast-small next to billions of pages.
    QueryDef("graph_pagerank", Some(s"""
      WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
      ), e AS (
        SELECT event_type AS src, next_type AS dst, count(*) AS w
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
      ), ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e GROUP BY 1),
      nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      r0 AS (SELECT node, $Scale // n AS r FROM nodes, nn),
      r1 AS (SELECT n2.node, (15 * $Scale) // (100 * (SELECT n FROM nn))
                   + COALESCE(c.s, 0) AS r
             FROM nodes n2 LEFT JOIN
               (SELECT e.dst AS node, CAST(sum((r0.r * 85 * e.w) // (100 * ow.out_w)) AS BIGINT) AS s
                FROM r0 JOIN e ON e.src = r0.node JOIN ow ON ow.src = e.src
                GROUP BY e.dst) c ON c.node = n2.node),
      r2 AS (SELECT n2.node, (15 * $Scale) // (100 * (SELECT n FROM nn))
                   + COALESCE(c.s, 0) AS r
             FROM nodes n2 LEFT JOIN
               (SELECT e.dst AS node, CAST(sum((r1.r * 85 * e.w) // (100 * ow.out_w)) AS BIGINT) AS s
                FROM r1 JOIN e ON e.src = r1.node JOIN ow ON ow.src = e.src
                GROUP BY e.dst) c ON c.node = n2.node),
      r3 AS (SELECT n2.node, (15 * $Scale) // (100 * (SELECT n FROM nn))
                   + COALESCE(c.s, 0) AS r
             FROM nodes n2 LEFT JOIN
               (SELECT e.dst AS node, CAST(sum((r2.r * 85 * e.w) // (100 * ow.out_w)) AS BIGINT) AS s
                FROM r2 JOIN e ON e.src = r2.node JOIN ow ON ow.src = e.src
                GROUP BY e.dst) c ON c.node = n2.node)
      SELECT node, CAST(r AS BIGINT) AS rank_ppm FROM r3 ORDER BY node""")) { (s, d) =>
      val ev = Tables.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = ev
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("w"))
      val outW = edges.groupBy(col("src").as("ow_src"))
        .agg(sum(col("w")).cast("long").as("out_w"))
      val edgesW = edges.join(outW, col("src") === col("ow_src")).drop("ow_src")
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
      val nn = nodes.agg(count(lit(1)).cast("long").as("n"))
      var ranks = nodes.crossJoin(nn)
        .select(col("node"), expr(s"$Scale div n").as("r"))
      for (_ <- 1 to Iters) {
        val contribs = ranks
          .join(edgesW, col("node") === col("src"))
          .select(col("dst"), expr("(r * 85 * w) div (100 * out_w)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).cast("long").as("s"))
        ranks = nodes.crossJoin(nn)
          .join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (expr(s"(15 * $Scale) div (100 * n)") + coalesce(col("s"), lit(0L))).as("r"))
      }
      ranks.select(col("node"), col("r").as("rank_ppm")).orderBy(col("node"))
    },

    /** MODEL-TRAINED quality gate — a decision stump (the 1R learner of
      * Holte 1993 and boosting's weak learner) fit by EXHAUSTIVE
      * threshold search, entirely relationally and in exact integers:
      * melt the per-doc ppm-scaled features, aggregate (feature, value)
      * class counts, one cumulative window per feature turns every
      * distinct value into a candidate threshold's exact confusion
      * counts (predict-above vs predict-below directions), argmax with
      * a total-order tiebreak. The judged output is each feature's best
      * stump + the global winner — on this corpus the learner RECOVERS
      * the quality rule's dominant term (tok_ppm > 300000 ⟺ the
      * len/200 saturation crossing 0.3) with zero training error,
      * which the oracle verifies exactly.
      *
      * Scale shape: one narrow scan → 4× melt → map-side-combined
      * (feature, value) aggregate (cardinality ≤ distinct feature
      * values, NOT corpus size) → per-feature window over that small
      * frame. At 100 TB the only corpus-size work is the first
      * aggregate; production stumps quantile-bin values first, which
      * only shrinks the windowed frame further. */
    QueryDef("curate_quality_stump", Some(raw"""
      WITH f AS (SELECT doc_id,
              least(1000000, CAST(len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS BIGINT) * 5000) AS x1,
              1000000 - (CAST(length(regexp_replace(text, '[A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')) AS BIGINT) * 1000000) // length(text) AS x2,
              1000000 - (CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) * 1000000) // length(text) AS x3,
              CAST(length(text) AS BIGINT) AS x4,
              CASE WHEN ${QualitySql} > 0.3 THEN 1 ELSE 0 END AS y
            FROM documents),
      tot AS (SELECT count(*) AS n, sum(y) AS p FROM f),
      m AS (SELECT feature, value, y FROM (
              SELECT unnest(['tok_ppm','punct_ppm','upper_ppm','n_chars']) AS feature,
                     unnest([x1, x2, x3, x4]) AS value, y FROM f) t),
      g AS (SELECT feature, value, count(*) AS cnt, sum(y) AS pos FROM m GROUP BY 1, 2),
      c AS (SELECT feature, value,
              sum(cnt) OVER (PARTITION BY feature ORDER BY value) AS cum_n,
              sum(pos) OVER (PARTITION BY feature ORDER BY value) AS cum_p
            FROM g),
      s AS (SELECT feature, value AS thr, 'gt' AS dir, (p - cum_p) + (cum_n - cum_p) AS n_correct FROM c, tot
            UNION ALL
            SELECT feature, value AS thr, 'le' AS dir, cum_p + ((n - p) - (cum_n - cum_p)) AS n_correct FROM c, tot),
      r AS (SELECT *, row_number() OVER (PARTITION BY feature ORDER BY n_correct DESC, dir, thr) AS rk FROM s),
      b AS (SELECT feature, thr, dir, n_correct FROM r WHERE rk = 1)
      SELECT feature, dir, CAST(thr AS BIGINT) AS thr, CAST(n_correct AS BIGINT) AS n_correct,
             CASE WHEN row_number() OVER (ORDER BY n_correct DESC, feature) = 1 THEN 1 ELSE 0 END AS is_best
      FROM b ORDER BY feature""")) { (s, d) =>
      import graft.functions.TextFunctions.{tokens, qualityScore, wsClass}
      val f = Tables.documents(s, d).select(col("doc_id"),
        least(lit(1000000L), size(tokens(col("text"))).cast("long") * 5000).as("x1"),
        (lit(1000000L) - expr(s"(CAST(length(regexp_replace(text, '[A-Za-z0-9$wsClass]', '')) AS BIGINT) * 1000000) div length(text)")).as("x2"),
        (lit(1000000L) - expr("(CAST(length(regexp_replace(text, '[^A-Z]', '')) AS BIGINT) * 1000000) div length(text)")).as("x3"),
        length(col("text")).cast("long").as("x4"),
        when(qualityScore(col("text")) > 0.3, 1L).otherwise(0L).as("y"))
      val tot = f.agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      val m = f.select(explode(array(
          struct(lit("tok_ppm").as("feature"), col("x1").as("value")),
          struct(lit("punct_ppm").as("feature"), col("x2").as("value")),
          struct(lit("upper_ppm").as("feature"), col("x3").as("value")),
          struct(lit("n_chars").as("feature"), col("x4").as("value")))).as("fv"), col("y"))
        .select(col("fv.feature").as("feature"), col("fv.value").as("value"), col("y"))
      val g = m.groupBy(col("feature"), col("value"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      // default RANGE frame: peers (ties) included — threshold semantics
      val wCum = Window.partitionBy(col("feature")).orderBy(col("value"))
      val c = g.select(col("feature"), col("value"),
        sum(col("cnt")).over(wCum).as("cum_n"), sum(col("pos")).over(wCum).as("cum_p"))
        .crossJoin(broadcast(tot))
      val sUp = c.select(col("feature"), col("value").as("thr"), lit("gt").as("dir"),
        ((col("p") - col("cum_p")) + (col("cum_n") - col("cum_p"))).as("n_correct"))
      val sDn = c.select(col("feature"), col("value").as("thr"), lit("le").as("dir"),
        (col("cum_p") + ((col("n") - col("p")) - (col("cum_n") - col("cum_p")))).as("n_correct"))
      val wBest = Window.partitionBy(col("feature"))
        .orderBy(col("n_correct").desc, col("dir"), col("thr"))
      sUp.union(sDn)
        .withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
        .withColumn("is_best",
          when(row_number().over(Window.orderBy(col("n_correct").desc, col("feature"))) === 1, 1L)
            .otherwise(0L))
        .select(col("feature"), col("dir"), col("thr"), col("n_correct"), col("is_best"))
        .orderBy(col("feature"))
    },

    /** DSIR-style importance weighting (Xie et al., "Data Selection for
      * Language Models via Importance Resampling", NeurIPS 2023) in the
      * repo's exact fixed-point discipline: per-token importance is the
      * add-one-smoothed unigram likelihood RATIO between the target
      * domain (lang='en' docs — the domain sample) and the raw corpus,
      * kept as an exact ppm rational — ((c_t+1)(T_r+V)·10^6) div
      * ((c_r+1)(T_t+V)) — instead of a log difference (log sums are
      * order-dependent IEEE; rationals hash-gate). A document's weight
      * is the exact mean over its token instances; selection keeps
      * weight > 1 (more target-like than raw), so no global ranking
      * shuffle exists anywhere in the plan.
      *
      * Scale shape: two map-side-combined vocab aggregates + one 1-row
      * totals frame (all broadcast), one equi-join of the token stream
      * against the vocab, one per-doc aggregate — the corpus shuffles
      * once, on doc_id. The ppm products stay < 2^63 for corpora up to
      * ~10^6 target tokens; beyond that the scale constant drops (the
      * ratio needs 6 significant digits, not the magnitude). */
    QueryDef("doc_dsir_weights", Some("""
      WITH toks AS (SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS tok
                    FROM documents),
      cr AS (SELECT tok, count(*) AS c_r FROM toks GROUP BY 1),
      ct AS (SELECT tok, count(*) AS c_t FROM toks WHERE lang = 'en' GROUP BY 1),
      tot AS (SELECT count(*) AS t_r, count(*) FILTER (WHERE lang = 'en') AS t_t,
                     count(DISTINCT tok) AS v FROM toks),
      sc AS (SELECT t.doc_id,
               ((coalesce(ct.c_t, 0) + 1) * (tot.t_r + tot.v) * 1000000)
                 // ((cr.c_r + 1) * (tot.t_t + tot.v)) AS ratio_ppm
             FROM toks t JOIN cr ON cr.tok = t.tok
             LEFT JOIN ct ON ct.tok = t.tok, tot)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS dsir_ppm,
             CAST(CASE WHEN sum(ratio_ppm) // count(*) > 1000000 THEN 1 ELSE 0 END AS BIGINT) AS selected
      FROM sc GROUP BY doc_id ORDER BY doc_id""")) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      val cr = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_r"))
      val ct = toks.filter(col("lang") === "en")
        .groupBy(col("tok")).agg(count(lit(1)).as("c_t"))
      val tot = toks.agg(count(lit(1)).as("t_r"),
        count(when(col("lang") === "en", 1)).as("t_t"),
        countDistinct(col("tok")).as("v"))
      toks.join(broadcast(cr), Seq("tok"))
        .join(broadcast(ct), Seq("tok"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("ratio_ppm", expr(
          "((coalesce(c_t, 0) + 1) * (t_r + v) * 1000000) div ((c_r + 1) * (t_t + v))"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          expr("sum(ratio_ppm) div count(1)").as("dsir_ppm"))
        .withColumn("selected", when(col("dsir_ppm") > 1000000L, 1L).otherwise(0L))
        .orderBy(col("doc_id"))
    },

    /** STREAMING CORPUS MAINTENANCE — the curation chain run as a
      * standing service: documents arrive as three mtime-ordered
      * micro-batches (doc_id ranges, the crawl's arrival order), and
      * each batch is quality-gated (doc_quality's exact formula,
      * > 0.3), first-wins-deduped WITHIN the batch, anti-joined against
      * the STANDING fingerprint index (exact-dedup against everything
      * already curated), then appended — survivors to batch_id-keyed
      * curated dirs (replay-idempotent), fingerprints to the index the
      * NEXT batch will probe. Batches 2 and 3 deliberately REPLAY every
      * 7th document of the preceding range (re-crawl duplicates), so
      * the cross-batch dedup path is value-exercised at every scale:
      * the oracle is the plain batch curation over the fixture — quality
      * gate + first-wins per fingerprint — and contains no replays, so
      * any replayed doc leaking past the index breaks the hash.
      *
      * Scale shape: per batch O(batch) scoring at scan speed, one
      * batch-side shuffle for the within-batch window, and an anti-join
      * whose BATCH side is small (the index side streams; at 100 TB the
      * index is fp-bucketed so the probe is a bucket-pruned equi-join).
      * The curated store and index only ever APPEND — no table rewrite
      * anywhere. */
    QueryDef("stream_curate_append", Some(raw"""
      WITH scored AS (SELECT doc_id, md5(lower(trim(text))) AS fp, $QualitySql AS quality FROM documents),
      k AS (SELECT * FROM scored WHERE quality > 0.3),
      r AS (SELECT doc_id, fp, quality, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM k)
      SELECT doc_id, fp, quality FROM r WHERE rn = 1 ORDER BY doc_id""")) { (s, d) =>
      import graft.functions.TextFunctions.{fingerprint, qualityScore}
      import graft.streaming.EventStreams
      import org.apache.hadoop.fs.{FileUtil, Path}
      import org.apache.spark.sql.streaming.Trigger
      val root = graft.Staging.dir("scurate", d)
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new Path(root).getFileSystem(conf)
      fs.delete(new Path(root), true)
      fs.mkdirs(new Path(root, "in"))
      val docs = Tables.documents(s, d)
      val third = (docs.agg(max(col("doc_id"))).head.getLong(0) + 1) / 3
      val replayed = (df: DataFrame) => df.filter(col("doc_id") % 7 === 0)
      val b0 = docs.filter(col("doc_id") < third)
      val b1 = docs.filter(col("doc_id") >= third && col("doc_id") < 2 * third)
      val arrivals = Seq(b0, b1.unionByName(replayed(b0)),
        docs.filter(col("doc_id") >= 2 * third).unionByName(replayed(b1)))
      val t0 = System.currentTimeMillis()
      arrivals.zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$root/stage$i")
        val part = fs.globStatus(new Path(s"$root/stage$i/part-*.parquet")).head.getPath
        val dst = new Path(s"$root/in/f$i.parquet")
        FileUtil.copy(fs, part, fs, dst, false, conf)
        fs.setTimes(dst, t0 + i * 60000L, -1)
      }
      // standing index starts empty but PRESENT (schema'd read of b*
      // must always match at least one footer-bearing dir)
      docs.limit(0).select(fingerprint(col("text")).as("fp"))
        .write.mode("overwrite").parquet(s"$root/fpindex/binit")
      val inSchema = s.read.parquet(s"$root/in").schema
      EventStreams.withStreamConf(s) {
        EventStreams.awaitOrKill(
          s.readStream.schema(inSchema).option("maxFilesPerTrigger", 1)
            .parquet(s"$root/in")
            .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
              CurationQueries.curateBatch(root, b, id)
            }
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow())
            .start(),
          "stream_curate_append")
      }
      s.read.schema("doc_id LONG, fp STRING, quality DOUBLE")
        .parquet(s"$root/curated/b*")
        .orderBy(col("doc_id"))
    }
  )
}
