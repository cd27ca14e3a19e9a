package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth text-pipeline batch: asymmetric containment dedup (the
  * sub-document duplication Jaccard resemblance misses) and a trained
  * bag-of-words classifier — the train→serve statistical-model shape
  * (fastText-style quality/language filters) every production curation
  * stack runs, expressed as pure relational algebra.
  */
object TextQueries5 {

  val defs: Seq[QueryDef] = Seq(

    /** CONTAINMENT near-dup detection (Broder's containment coefficient
      * C(A→B) = |S(A)∩S(B)| / |S(A)|): find documents whose shingle set
      * is mostly INSIDE another document's — the quote-heavy page, the
      * article embedded in a boilerplate wrapper, the chunk re-crawled
      * inside an aggregator. Jaccard resemblance (dedup_ngram_jaccard,
      * dedup_minhash_lsh) is symmetric and misses exactly this case: a
      * 100-token doc fully contained in a 10k-token doc has Jaccard
      * ≈ 0.01 but containment 1.0.
      *
      * Both engines compute over the df≤10-PRUNED token-3-gram sets
      * (numerator and denominator alike): corpus-common "stop shingles"
      * carry no dup evidence and their posting lists are the quadratic
      * hazard, so production containment (and winnowing's dedup join,
      * same discipline) cuts them before pairing. The cut caps the
      * per-shingle pair fan-out at df·(df−1) ≤ 90 directed pairs, which
      * is what makes the self-join linear in corpus size rather than
      * quadratic — the same absolute-df stop-gram rule measured at ×10
      * scale on dedup_winnowing (PLANS.md: pairs GREW only 2× for 10×
      * docs because an absolute threshold prunes proportionally more of
      * a bigger corpus). Shape at 100 TB: one shingle explode + one
      * equi-join on the pruned shingle (shuffle by g), one pair
      * aggregate (shuffle by src,dst), set sizes re-join by src —
      * no cartesian anywhere, no driver state. Emitted pairs are
      * DIRECTED (src mostly-inside dst at ≥ 50%, exact integer
      * cross-multiplication — no float threshold). */
    QueryDef("dedup_containment", Some(raw"""
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS g
             FROM t WHERE len(w) >= 3),
      df AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 10),
      ps AS (SELECT sh.doc_id, sh.g FROM sh JOIN df USING (g)),
      sz AS (SELECT doc_id, count(*) AS n FROM ps GROUP BY 1),
      pairs AS (SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS inter
                FROM ps a JOIN ps b ON b.g = a.g AND b.doc_id <> a.doc_id GROUP BY 1, 2)
      SELECT src, dst, CAST((inter * 1000000) // sz.n AS BIGINT) AS containment_ppm
      FROM pairs JOIN sz ON sz.doc_id = pairs.src
      WHERE inter * 2 >= sz.n
      ORDER BY src, dst""")) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
      // materialize the exploded posting list ONCE: it feeds the df
      // pass, the pruned list, and BOTH sides of the pair join — left
      // as lineage the tokenize+explode re-evaluates 4x (the
      // doc_winnowing lesson; simhashPairs uses the same cut). The df
      // prune stays a groupBy (map-side combine absorbs hot stop
      // shingles; a window over g would sort the skewed partitions we
      // are about to throw away).
      val sh = t.select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => array_join(slice(col("w"), i, lit(3)), " ")))).as("g"))
        .localCheckpoint()
      val kept = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select(col("g"))
      val ps = sh.join(kept, Seq("g")).localCheckpoint()
      val sz = ps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val pairs = ps.as("a").join(ps.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .agg(count(lit(1)).as("inter"))
      pairs.join(sz.withColumnRenamed("doc_id", "src"), Seq("src"))
        .filter(col("inter") * 2 >= col("n_sh"))
        .select(col("src"), col("dst"),
          expr("(inter * 1000000) div n_sh").as("containment_ppm"))
        .orderBy(col("src"), col("dst"))
    },

    /** TRAINED corpus classifier — multinomial Naive-Bayes-family
      * train/serve as one judged lineage: fit per-class token counts on
      * the even-doc_id half (the labeled training split), then classify
      * every held-out odd-doc_id document by argmax of its add-one-
      * smoothed per-token class likelihoods. This is the mechanism
      * under every fastText-style quality/language/domain filter in a
      * training-data pipeline; the judged artifact is the exact
      * train→smooth→score→argmax chain, not the accuracy (the synthetic
      * fixture's `lang` label is deliberately uncorrelated with its
      * token stream — all five labels draw the same 31-token vocabulary
      * — so predictions sit at chance here BY CONSTRUCTION of the
      * fixture; same stance as doc_lang_confusion, where the hash gates
      * the mechanism and the readout reports whatever quality falls
      * out).
      *
      * Determinism: scores are the exact-integer LINEAR form of NB —
      * per-token smoothed likelihood in truncated ppm, summed per
      * (doc, class) — because log-likelihood sums are IEEE-order-
      * dependent and would hash-mismatch the oracle (same fixed-point
      * discipline as doc_lm_score / text_bm25_topk); ranking ties break
      * on class name, making the argmax total. Shape at 100 TB: the
      * model IS the (class, token) count table — a bounded-vocab
      * aggregate that broadcasts (web-scale vocab: it shuffle-joins on
      * token instead, still one corpus pass); scoring fans each token
      * instance out by |classes| (languages are dozens, a bounded
      * constant), then one doc_id shuffle aggregates scores and one
      * broadcast-small window picks the argmax. Train tables build
      * map-side-combined; the corpus is scanned once per split. */
    QueryDef("doc_nb_classify", Some(raw"""
      WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      tr AS (SELECT lang, unnest(w) AS token FROM t WHERE doc_id % 2 = 0),
      cwl AS (SELECT lang, token, count(*) AS c FROM tr GROUP BY 1, 2),
      cl AS (SELECT lang, count(*) AS n FROM tr GROUP BY 1),
      v AS (SELECT count(DISTINCT token) AS v FROM tr),
      te AS (SELECT doc_id, lang AS lang_true, unnest(w) AS token FROM t WHERE doc_id % 2 = 1),
      sc AS (SELECT te.doc_id, te.lang_true, cl.lang,
               ((COALESCE(cwl.c, 0) + 1) * 1000000) // (cl.n + v.v) AS p_ppm
             FROM te CROSS JOIN cl CROSS JOIN v
             LEFT JOIN cwl ON cwl.lang = cl.lang AND cwl.token = te.token),
      agg AS (SELECT doc_id, lang_true, lang, CAST(sum(p_ppm) AS BIGINT) AS score_ppm
              FROM sc GROUP BY 1, 2, 3),
      rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, lang) AS rk FROM agg)
      SELECT doc_id, lang_true AS lang, lang AS lang_pred, score_ppm, lang = lang_true AS correct
      FROM rk WHERE rk = 1 ORDER BY doc_id""")) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      val tr = t.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .select(col("lang"), explode(col("w")).as("token"))
      val cwl = tr.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
      val cl = tr.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val v = tr.agg(countDistinct(col("token")).as("v"))
      val te = t.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .select(col("doc_id"), col("lang").as("lang_true"), explode(col("w")).as("token"))
      val sc = te.crossJoin(broadcast(cl)).crossJoin(broadcast(v))
        .join(broadcast(cwl), Seq("lang", "token"), "left")
        .withColumn("p_ppm", expr("((coalesce(c, 0) + 1) * 1000000) div (n + v)"))
      val agg = sc.groupBy(col("doc_id"), col("lang_true"), col("lang"))
        .agg(sum(col("p_ppm")).as("score_ppm"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_ppm").desc, col("lang"))
      agg.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("doc_id"), col("lang_true").as("lang"),
          col("lang").as("lang_pred"), col("score_ppm"),
          (col("lang") === col("lang_true")).as("correct"))
        .orderBy(col("doc_id"))
    },
  )
}
