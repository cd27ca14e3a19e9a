package graft.queries

import graft.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 §3.2) — the
  * tokenizer-construction step of an LLM data pipeline, judged EXACTLY:
  * learn the top-`Rounds` merges over the corpus and re-segment with
  * them, both gated on a DuckDB oracle that replays the identical
  * algorithm in SQL.
  *
  * Algorithm (mirrored op-for-op on both engines):
  *   1. Collapse the corpus to the word-frequency table (Sennrich's
  *      vocabulary). THIS is the scale story: BPE never trains on raw
  *      text — pair statistics are linear in DISTINCT words (Heaps'
  *      law: ~millions at 100 TB, trivially shuffleable), and the only
  *      corpus-size cost is the initial word count, one map-side-
  *      combined aggregate.
  *   2. Explode each distinct word into (idx, sym) character rows.
  *   3. Per round: count adjacent symbol pairs weighted by word
  *      frequency (overlapping occurrences count, as in Sennrich's
  *      `get_stats`); pick argmax with a total-order tiebreak
  *      (count desc, pair lexicographic); apply the merge leftmost-
  *      greedily (`merge_vocab`'s regex replace): in a run of equal
  *      symbols only every other candidate merges, which the relational
  *      form expresses as gaps-and-islands parity over the candidate
  *      positions (adjacent candidates exist ONLY when left=right —
  *      for a≠b a candidate at i forces sym(i+1)=b≠a, so no candidate
  *      can start at i+1).
  *   4. Re-densify idx (row_number) so the next round's adjacency is
  *      positional again.
  *
  * Per round the plan is: one window shuffle on `word` (lead), one
  * map-side-combined pair aggregate, a 1-row broadcast argmax joined
  * back, and vocab-sized island windows — rounds compose lazily into
  * one lineage, no driver-side loop over data. The merge table the
  * rounds emit IS the artifact a production run would persist and ship
  * to the (embarrassingly parallel) corpus re-segmentation pass.
  *
  * Reference tie-in: the reference has no tokenizer surface (it
  * delegates analysis to BigQuery, README.md:3); this family belongs
  * to the LLM-pipeline extension mandated by the build brief.
  */
object TokenizerQueries {

  private[graft] val Rounds = 3

  /** Word-frequency table exploded to per-character rows
    * `(word, wc, idx, sym)`, idx dense 1..len. The ONE corpus-size
    * aggregate; everything after runs on distinct words. */
  private[graft] def charRows(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")))).as("idx"))
      .withColumn("sym", expr("substr(word, idx, 1)"))

  private def wOrd = Window.partitionBy(col("word")).orderBy(col("idx"))

  private def withNext(r: DataFrame): DataFrame =
    r.withColumn("nxt", lead(col("sym"), 1).over(wOrd))

  /** Round argmax: the most frequent adjacent pair, weighted by word
    * frequency, total-order tiebreak — a 1-row frame (broadcast). */
  private[graft] def topPair(r: DataFrame): DataFrame =
    withNext(r).filter(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt"))
      .agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("sym"), col("nxt"))
      .limit(1)
      .select(col("sym").as("a"), col("nxt").as("b"), col("cnt"))

  /** Apply one merge leftmost-greedily and re-densify idx. Candidate
    * runs (only possible when a=b) merge at odd island offsets; the
    * row AFTER each selected start is consumed. */
  private[graft] def applyMerge(r: DataFrame, sel: DataFrame): DataFrame = {
    val n = withNext(r).crossJoin(broadcast(sel))
    val starts = n.filter(col("sym") === col("a") && col("nxt") === col("b"))
      .withColumn("grp", col("idx") - row_number().over(wOrd))
      .withColumn("rr", row_number().over(
        Window.partitionBy(col("word"), col("grp")).orderBy(col("idx"))))
      .filter(col("rr") % 2 === 1)
      .select(col("word").as("mw"), col("idx").as("midx"))
    n.join(starts, col("word") === col("mw") && col("idx") === col("midx"), "left")
      .withColumn("is_start", col("midx").isNotNull)
      .drop("mw", "midx")
      .join(starts.select(col("mw").as("cw"), (col("midx") + 1).as("cidx")),
        col("word") === col("cw") && col("idx") === col("cidx"), "left")
      .filter(col("cidx").isNull)
      .withColumn("msym", when(col("is_start"), concat(col("a"), col("b"))).otherwise(col("sym")))
      .select(col("word"), col("wc"), col("idx").as("oidx"), col("msym").as("sym"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("oidx"))))
      .select(col("word"), col("wc"), col("idx"), col("sym"))
  }

  /** The full chain: per-round 1-row selections + the final segmented
    * rows. Each round is pinned with `localCheckpoint` (the repo's
    * iterative-lineage idiom, as in dedup_components' pointer-jumping):
    * round k's frame feeds BOTH the argmax and the merge apply, and
    * without the barrier the final lineage re-derives round k once per
    * downstream use — 2^Rounds recomputations of the whole window
    * chain (measured: 8.4 s → ~1 s at sf0.1 for the 3-round chain).
    * At 100 TB this barrier is exactly where a production run would
    * persist the between-rounds vocabulary table. */
  private[graft] def trainChain(docs: DataFrame): (Seq[DataFrame], DataFrame) =
    trainChainWith(docs, topPair)

  /** The same chain under ANY per-round argmax — the merge-application
    * machinery is selection-agnostic, which is how the WordPiece
    * family ([[WordpieceQueries]]) reuses it with only the likelihood-
    * ratio argmax swapped in. `sel`'s frame must expose (a, b) plus
    * whatever metrics its caller reports. */
  private[graft] def trainChainWith(docs: DataFrame,
      sel: DataFrame => DataFrame): (Seq[DataFrame], DataFrame) = {
    val z = (Vector.empty[DataFrame], charRows(docs).localCheckpoint(true))
    (1 to Rounds).foldLeft(z) { case ((sels, r), _) =>
      val s = sel(r).localCheckpoint(true)
      (sels :+ s, applyMerge(r, s).localCheckpoint(true))
    }
  }

  // ---- oracle (generated from the same Rounds constant — cannot drift)

  /** The merge-APPLICATION CTEs (n/c/r) for round k — selection-
    * agnostic (consume whatever `sel$k(a, b, …)` an argmax CTE
    * defines), shared verbatim with the WordPiece oracle. */
  private[graft] def applySql(k: Int): String = {
    val p = s"r${k - 1}"
    s"""
n$k AS (
  SELECT word, wc, idx, sym, lead(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt FROM $p),
c$k AS (
  SELECT word, idx FROM (
    SELECT word, idx, row_number() OVER (PARTITION BY word, grp ORDER BY idx) AS rr FROM (
      SELECT n.word, n.idx, n.idx - row_number() OVER (PARTITION BY n.word ORDER BY n.idx) AS grp
      FROM n$k n, sel$k s WHERE n.sym = s.a AND n.nxt = s.b) t1) t2
  WHERE rr % 2 = 1),
r$k AS (
  SELECT word, wc, CAST(row_number() OVER (PARTITION BY word ORDER BY idx) AS INT) AS idx, sym FROM (
    SELECT n.word, n.wc, n.idx,
           CASE WHEN st.idx IS NOT NULL THEN s.a || s.b ELSE n.sym END AS sym
    FROM n$k n CROSS JOIN sel$k s
    LEFT JOIN c$k st ON st.word = n.word AND st.idx = n.idx
    LEFT JOIN c$k cn ON cn.word = n.word AND cn.idx + 1 = n.idx
    WHERE cn.idx IS NULL) t3)"""
  }

  /** Shared WITH prefix (wfreq + r0) — see the r0 scaladoc below. */
  private[graft] def chainPrefixSql: String =
    """
WITH wfreq AS (
  SELECT word, count(*) AS wc FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS word FROM documents) t
  WHERE word <> '' GROUP BY word),
r0 AS (
  SELECT word, wc, CAST(i AS INT) AS idx, substr(word, CAST(i AS INT), 1) AS sym
  FROM (SELECT word, wc, unnest(range(1, length(word) + 1)) AS i FROM wfreq) t),"""

  private def roundSql(k: Int): String = {
    val p = s"r${k - 1}"
    s"""
p$k AS (
  SELECT sym, nxt, sum(wc) AS cnt FROM (
    SELECT word, wc, sym, lead(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt FROM $p) t
  WHERE nxt IS NOT NULL GROUP BY sym, nxt),
sel$k AS (SELECT sym AS a, nxt AS b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),${applySql(k)}"""
  }

  /** Shared oracle prefix: wfreq + r0 + all round CTEs. r0 explodes
    * each word into characters via the per-row `range(1, length+1)`
    * list — the exact twin of Spark's `sequence(1, length)`, with no
    * word-length cap on either side (a fixed `generate_series(1, 64)`
    * bound would silently truncate only the oracle on a drifted
    * fixture and surface as an opaque hash diff — round-9 ADVICE). */
  private val chainSql: String =
    chainPrefixSql + (1 to Rounds).map(roundSql).mkString(",")

  val defs: Seq[QueryDef] = Seq(

    // The learned merge table — rank, pair, merged symbol, and the
    // (overlap-counted, frequency-weighted) pair count the selection
    // used. This is the artifact a production tokenizer build persists.
    QueryDef("text_bpe_train", Some(chainSql + s"""
      SELECT CAST(k AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,
             a || b AS merged, CAST(cnt AS BIGINT) AS pair_count FROM (
        ${(1 to Rounds).map(k => s"SELECT $k AS k, * FROM sel$k").mkString(" UNION ALL ")}) u
      ORDER BY merge_rank""")) { (s, d) =>
      val (sels, _) = trainChain(Tables.documents(s, d))
      sels.zipWithIndex.map { case (sel, i) =>
        sel.select(lit(i + 1L).as("merge_rank"), col("a").as("left_sym"),
          col("b").as("right_sym"), concat(col("a"), col("b")).as("merged"),
          col("cnt").as("pair_count"))
      }.reduce(_ union _).orderBy(col("merge_rank"))
    },

    // Corpus re-segmented with the learned merges: top-20 subword
    // tokens by frequency-weighted occurrence. Shares the whole chain
    // verbatim with text_bpe_train, so selection AND application are
    // both inside this query's hash gate.
    QueryDef("text_bpe_segment", Some(chainSql + s"""
      SELECT sym AS token, CAST(sum(wc) AS BIGINT) AS n
      FROM r$Rounds GROUP BY sym ORDER BY n DESC, token LIMIT 20""")) { (s, d) =>
      val (_, rFinal) = trainChain(Tables.documents(s, d))
      rFinal.groupBy(col("sym").as("token"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    // CORPUS TOKENIZATION with the learned tokenizer — the deployment
    // half: segmentation is computed once per DISTINCT word (the
    // word → subword-count map falls out of the trained chain), and
    // the corpus pays ONE broadcast equi-join on the word — the token
    // stream never re-runs merges and never shuffles on the word key.
    // This is why BPE-tokenizing 100 TB is a map-side pass: the
    // vocabulary table is Heaps-law small and broadcastable. Per-doc
    // word and subword counts are judged; the oracle extends the
    // shared chain, so training, application, AND the deployment join
    // all sit inside this query's hash gate.
    QueryDef("text_bpe_tokenize", Some(chainSql + raw""",
      wseg AS (SELECT word, count(*) AS n_sub FROM r$Rounds GROUP BY word),
      toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS word FROM documents),
      j AS (SELECT t.doc_id, w.n_sub FROM toks t JOIN wseg w ON w.word = t.word WHERE t.word <> '')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(n_sub) AS BIGINT) AS n_subwords
      FROM j GROUP BY doc_id ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val (_, rFinal) = trainChain(docs)
      val wseg = rFinal.groupBy(col("word")).agg(count(lit(1)).as("n_sub"))
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .join(broadcast(wseg), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
        .orderBy(col("doc_id"))
    }
  )
}
