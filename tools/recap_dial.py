#!/usr/bin/env python3
"""Recap-cadence dial (round-18 verdict task 3; dev measurement tool).

For each directional-delete index family — MinHash (capped band
buckets), SimHash (capped band buckets), containment (df-pruned
posting lists) — measure when the directional gap actually BITES:
confirmed probe hits under the O(tombstones) tombstone-SERVE
(artifact-true semantics: cap/prune computed over the full standing
set FIRST, then the tombstone filter) versus the full RECAP
(tombstones removed FIRST, cap/prune recomputed over survivors — the
rebuild-over-survivors semantics every recap query judges).

Tombstone slice doc_id % K = 3 at K = 40/20/10/4 → 2.5/5/10/25% of the
corpus (the round-17 MinHash dial's staging, extended to the other two
families). Directionality guarantees serve-hits ⊆ recap-hits per pair:
 - capped families: a recap re-admits cap-evicted members;
 - containment: deletions only LOWER a shingle's df, so the survivor
   re-prune re-admits posting lists and per-pair intersections only
   grow (thresholded containment is monotone in the intersection).
So `lost` = recap − serve is the recall the tombstone path forgoes
until the next recap window.

Usage: python3 tools/recap_dial.py [sfDir ...]
(defaults: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""
import sys

import duckdb

# DuckDB CTE chains mirror the Scala oracles verbatim (TextQueries.
# minhashBandsRawSql / simhashBandsSql, TextQueries5's shingle chain).
MINHASH_P = 2147483647


def bands_sql_from_scala():
    """The minhash band CTE, generated from the SAME deterministic
    coefficient derivation TextQueries.minhashA/minhashB commits
    (Knuth multiplicative + Numerical-Recipes LCG constants mod the
    Mersenne prime) — the dial cannot drift from the judged oracle."""
    def ca(k):
        a = (2654435761 * (k + 1)) % MINHASH_P
        return a if a != 0 else 1

    def cb(k):
        return (1013904223 * (k + 1) + 12345) % MINHASH_P

    mins = ", ".join(f"min(({ca(k)} * x + {cb(k)}) % {MINHASH_P})" for k in range(32))
    return f"""
      toks AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
                   i -> substr(t, CAST(i AS INT), 5)))) AS tok
               FROM (SELECT doc_id, lower(trim(text)) AS t FROM documents) lt),
      th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 14))::BIGINT % {MINHASH_P} AS x
             FROM toks),
      sig AS (SELECT doc_id, [{mins}] AS sig FROM th GROUP BY doc_id),
      bands AS (SELECT doc_id, sig, i AS band, sig[2*i + 1] AS bk1, sig[2*i + 2] AS bk2
                FROM sig CROSS JOIN range(0, 16) AS t(i))"""


SIMHASH_BANDS = r"""
      toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS tok
               FROM documents),
      th AS (SELECT doc_id, md5(tok) AS h FROM toks),
      bits AS (SELECT doc_id, i,
                 ((strpos('0123456789abcdef', substr(h, i // 4 + 1, 1)) - 1)
                   // (1 << (i % 4))) % 2 AS bit
               FROM th CROSS JOIN range(0, 64) AS t(i)),
      votes AS (SELECT doc_id, i, CASE WHEN sum(2 * bit - 1) > 0 THEN 1 ELSE 0 END AS sbit
                FROM bits GROUP BY doc_id, i),
      sig AS (SELECT doc_id, list(sbit ORDER BY i) AS bits FROM votes GROUP BY doc_id),
      bands AS (SELECT doc_id, bits, b AS band,
                  CAST(list_sum(list_transform(range(0, 8), i -> bits[8 * b + i + 1] * (1 << i))) AS INT) AS bkey
                FROM sig CROSS JOIN range(0, 8) AS t(b))"""


def q_minhash(k, bands_cte):
    return f"""
      WITH {bands_cte},
      idx0 AS (SELECT * FROM bands WHERE doc_id % 5 <> 0
               QUALIFY row_number() OVER (PARTITION BY band, bk1, bk2 ORDER BY doc_id) <= 200),
      serve AS (SELECT * FROM idx0 WHERE doc_id % {k} <> 3),
      recap AS (SELECT * FROM bands WHERE doc_id % 5 <> 0 AND doc_id % {k} <> 3
                QUALIFY row_number() OVER (PARTITION BY band, bk1, bk2 ORDER BY doc_id) <= 200),
      bat AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
      sh AS (SELECT DISTINCT b.doc_id, i.doc_id AS idx_id FROM bat b JOIN serve i
               ON i.band = b.band AND i.bk1 = b.bk1 AND i.bk2 = b.bk2
             WHERE len(list_filter(range(1, 33), x -> b.sig[x] = i.sig[x])) >= 16),
      rh AS (SELECT DISTINCT b.doc_id, i.doc_id AS idx_id FROM bat b JOIN recap i
               ON i.band = b.band AND i.bk1 = b.bk1 AND i.bk2 = b.bk2
             WHERE len(list_filter(range(1, 33), x -> b.sig[x] = i.sig[x])) >= 16)
      SELECT (SELECT count(*) FROM sh) AS serve_hits,
             (SELECT count(*) FROM rh) AS recap_hits,
             (SELECT count(*) FROM rh ANTI JOIN sh USING (doc_id, idx_id)) AS lost"""


def q_simhash(k):
    return f"""
      WITH {SIMHASH_BANDS},
      idx0 AS (SELECT * FROM bands WHERE doc_id % 5 <> 0
               QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 200),
      serve AS (SELECT * FROM idx0 WHERE doc_id % {k} <> 3),
      recap AS (SELECT * FROM bands WHERE doc_id % 5 <> 0 AND doc_id % {k} <> 3
                QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 200),
      bat AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
      sh AS (SELECT DISTINCT b.doc_id, i.doc_id AS idx_id FROM bat b JOIN serve i
               ON i.band = b.band AND i.bkey = b.bkey
             WHERE list_sum(list_transform(list_zip(b.bits, i.bits),
               s -> CASE WHEN s[1] <> s[2] THEN 1 ELSE 0 END)) <= 16),
      rh AS (SELECT DISTINCT b.doc_id, i.doc_id AS idx_id FROM bat b JOIN recap i
               ON i.band = b.band AND i.bkey = b.bkey
             WHERE list_sum(list_transform(list_zip(b.bits, i.bits),
               s -> CASE WHEN s[1] <> s[2] THEN 1 ELSE 0 END)) <= 16)
      SELECT (SELECT count(*) FROM sh) AS serve_hits,
             (SELECT count(*) FROM rh) AS recap_hits,
             (SELECT count(*) FROM rh ANTI JOIN sh USING (doc_id, idx_id)) AS lost"""


def q_containment(k):
    return rf"""
      WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w FROM documents),
      sh0 AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS g
              FROM t WHERE len(w) >= 3),
      idx0 AS (SELECT doc_id AS idx_id, g FROM sh0 WHERE doc_id % 5 <> 0),
      keep_full AS (SELECT g FROM idx0 GROUP BY g HAVING count(*) <= 10),
      serve AS (SELECT idx0.idx_id, idx0.g FROM idx0 JOIN keep_full USING (g)
                WHERE idx0.idx_id % {k} <> 3),
      surv AS (SELECT * FROM idx0 WHERE idx_id % {k} <> 3),
      keep_surv AS (SELECT g FROM surv GROUP BY g HAVING count(*) <= 10),
      recap AS (SELECT surv.idx_id, surv.g FROM surv JOIN keep_surv USING (g)),
      bat AS (SELECT doc_id, g FROM sh0 WHERE doc_id % 5 = 0),
      sz AS (SELECT doc_id, count(*) AS n FROM bat GROUP BY 1),
      sh AS (SELECT h.doc_id, h.idx_id
             FROM (SELECT bat.doc_id, serve.idx_id, count(*) AS inter
                   FROM bat JOIN serve USING (g) GROUP BY 1, 2) h
             JOIN sz ON sz.doc_id = h.doc_id WHERE h.inter * 2 >= sz.n),
      rh AS (SELECT h.doc_id, h.idx_id
             FROM (SELECT bat.doc_id, recap.idx_id, count(*) AS inter
                   FROM bat JOIN recap USING (g) GROUP BY 1, 2) h
             JOIN sz ON sz.doc_id = h.doc_id WHERE h.inter * 2 >= sz.n)
      SELECT (SELECT count(*) FROM sh) AS serve_hits,
             (SELECT count(*) FROM rh) AS recap_hits,
             (SELECT count(*) FROM rh ANTI JOIN sh USING (doc_id, idx_id)) AS lost"""


def main(dirs):
    bands_cte = bands_sql_from_scala()
    print(f"{'family':12s} {'sf':10s} {'K':>3s} {'tomb%':>6s} {'serve':>8s} {'recap':>8s} {'lost':>6s} {'loss%':>7s}")
    for d in dirs:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        sf = d.rstrip("/").split("/")[-1]
        for fam, qf in (("minhash", lambda k: q_minhash(k, bands_cte)),
                        ("simhash", q_simhash),
                        ("containment", q_containment)):
            for k in (40, 20, 10, 4):
                s, r, lost = con.execute(qf(k)).fetchone()
                # directionality: serve ⊆ recap pairwise, so the recap-
                # only count must equal the size difference exactly — a
                # violation means the family is NOT directional and the
                # whole serve-until-recap policy is unsound for it
                assert lost == r - s, \
                    f"directionality violated: {fam} K={k} serve={s} recap={r} recap_only={lost}"
                loss = 100.0 * lost / r if r else 0.0
                print(f"{fam:12s} {sf:10s} {k:3d} {100.0/k:6.1f} {s:8d} {r:8d} {lost:6d} {loss:7.2f}")
        con.close()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or
                  ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]))
