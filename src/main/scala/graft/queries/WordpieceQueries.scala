package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece merge training (Schuster & Nakajima, "Japanese and Korean
  * voice search", ICASSP 2012 — the BERT tokenizer's trainer),
  * completing the production tokenizer triad: BPE merges the most
  * FREQUENT adjacent pair (TokenizerQueries), unigram-LM prunes a
  * seeded vocabulary (UnigramQueries), WordPiece merges the pair with
  * the highest LIKELIHOOD RATIO score(a,b) = count(ab) /
  * (count(a)·count(b)) — "merge the pair most surprising under
  * independence", so a rare-but-always-together pair beats a frequent
  * coincidence. Everything else — the word-frequency collapse (the
  * distinct-words scale story), overlap-counted pair statistics, the
  * leftmost-greedy gaps-and-islands merge application — is shared
  * with the BPE trainer by construction: this object supplies ONLY
  * the argmax ([[topPairWp]]) to [[TokenizerQueries.trainChainWith]]
  * and ONLY the selection CTE around [[TokenizerQueries.applySql]],
  * so the two families differ exactly where the algorithms differ.
  *
  * Exact arithmetic: the ratio is scored as
  * `(cnt · 10⁹) div (c_a · c_b)` — truncating integer division over
  * positive operands, identical in Spark (`div`) and DuckDB (`//`) —
  * with total-order tiebreak (score desc, pair count desc, pair
  * lexicographic), the repo's standing fixed-point discipline. Both
  * factors are bounded by the corpus symbol-instance count (~10⁶ at
  * sf0.1), so the products stay far inside int64.
  *
  * Per round the plan adds ONE map-side-combined symbol-count
  * aggregate (vocab-sized) to BPE's shape; both join the pair frame
  * broadcast-small. The `##` continuation-prefix display convention of
  * deployed WordPiece is presentational and deliberately omitted —
  * symbols are plain concatenations, as in the BPE family.
  *
  * Reference tie-in: the reference has no tokenizer surface (it
  * delegates analysis to BigQuery, README.md:3); this family belongs
  * to the LLM-pipeline extension mandated by the build brief.
  */
object WordpieceQueries {

  private val Rounds = TokenizerQueries.Rounds

  /** Round argmax under the likelihood-ratio score — a 1-row frame.
    * Output columns (a, b, cnt, score_ppb); [[TokenizerQueries
    * .applyMerge]] consumes (a, b) and ignores the metrics. */
  private[graft] def topPairWp(r: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("word")).orderBy(col("idx"))
    val pairs = r.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt"))
      .agg(sum(col("wc")).as("cnt"))
    val syms = r.groupBy(col("sym")).agg(sum(col("wc")).as("c"))
    pairs
      .join(syms.select(col("sym"), col("c").as("c_a")), Seq("sym"))
      .join(syms.select(col("sym").as("nxt"), col("c").as("c_b")), Seq("nxt"))
      // int64 headroom guard (round-13 ADVICE): past ~3e9 symbol
      // instances, c_a·c_b (and past ~9e9, cnt·1e9) silently wraps in
      // non-ANSI Spark and would select WRONG merges with no error.
      // Both factors ≤ 3e9 keeps the product ≤ 9e18 < 2^63, and
      // cnt ≤ min(c_a, c_b) bounds the numerator transitively — so the
      // guard fails loudly exactly where the scaladoc's bound ends
      // (the winnowFingerprints raise_error discipline; per-row, no
      // extra driver action in the lazy train chain).
      .withColumn("score_ppb", expr(
        "CASE WHEN c_a > 3000000000 OR c_b > 3000000000 THEN " +
          "CAST(raise_error('topPairWp: symbol instance count exceeds the " +
          "3e9 int64 scoring headroom - requantize or shard the corpus') AS BIGINT) " +
          "ELSE (cnt * 1000000000) div (c_a * c_b) END"))
      .orderBy(col("score_ppb").desc, col("cnt").desc, col("sym"), col("nxt"))
      .limit(1)
      .select(col("sym").as("a"), col("nxt").as("b"), col("cnt"), col("score_ppb"))
  }

  /** The BPE chain with the WordPiece argmax swapped in. */
  private[graft] def trainChainWp(docs: DataFrame): (Seq[DataFrame], DataFrame) =
    TokenizerQueries.trainChainWith(docs, topPairWp)

  // ---- oracle: the shared chain prefix + per-round WordPiece
  // selection CTE + the shared application CTEs (TokenizerQueries
  // .applySql — the algorithms share the application step by
  // definition, so its SQL lives in exactly one place).

  private def roundSql(k: Int): String = {
    val p = s"r${k - 1}"
    s"""
p$k AS (
  SELECT sym, nxt, sum(wc) AS cnt FROM (
    SELECT word, wc, sym, lead(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt FROM $p) t
  WHERE nxt IS NOT NULL GROUP BY sym, nxt),
sc$k AS (SELECT sym, sum(wc) AS c FROM $p GROUP BY sym),
sel$k AS (
  SELECT a, b, cnt, score_ppb FROM (
    SELECT p.sym AS a, p.nxt AS b, p.cnt AS cnt,
           (p.cnt * 1000000000) // (sa.c * sb.c) AS score_ppb
    FROM p$k p JOIN sc$k sa ON sa.sym = p.sym JOIN sc$k sb ON sb.sym = p.nxt) t
  ORDER BY score_ppb DESC, cnt DESC, a, b LIMIT 1),${TokenizerQueries.applySql(k)}"""
  }

  private val chainSql: String =
    TokenizerQueries.chainPrefixSql + (1 to Rounds).map(roundSql).mkString(",")

  val defs: Seq[QueryDef] = Seq(

    // The learned merge table with the selection metrics — rank, pair,
    // merged symbol, overlap-counted pair count, and the exact-ppb
    // likelihood-ratio score the argmax used.
    QueryDef("text_wordpiece_train", Some(chainSql + s"""
      SELECT CAST(k AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,
             a || b AS merged, CAST(cnt AS BIGINT) AS pair_count,
             CAST(score_ppb AS BIGINT) AS score_ppb FROM (
        ${(1 to Rounds).map(k => s"SELECT $k AS k, * FROM sel$k").mkString(" UNION ALL ")}) u
      ORDER BY merge_rank""")) { (s, d) =>
      val (sels, _) = trainChainWp(Tables.documents(s, d))
      sels.zipWithIndex.map { case (sel, i) =>
        sel.select(lit(i + 1L).as("merge_rank"), col("a").as("left_sym"),
          col("b").as("right_sym"), concat(col("a"), col("b")).as("merged"),
          col("cnt").as("pair_count"), col("score_ppb"))
      }.reduce(_ union _).orderBy(col("merge_rank"))
    },

    // Corpus re-segmented with the learned merges: top-20 subword
    // tokens by frequency-weighted occurrence — selection AND
    // application both inside the hash gate (the text_bpe_segment
    // shape under the other selection rule).
    QueryDef("text_wordpiece_segment", Some(chainSql + s"""
      SELECT sym AS token, CAST(sum(wc) AS BIGINT) AS n
      FROM r$Rounds GROUP BY sym ORDER BY n DESC, token LIMIT 20""")) { (s, d) =>
      val (_, rFinal) = trainChainWp(Tables.documents(s, d))
      rFinal.groupBy(col("sym").as("token"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },
  )
}
