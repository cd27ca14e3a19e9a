#!/usr/bin/env python3
"""Build the committed DEFLATE-length fixture that gives
doc_compression_ratio a full rows+schema+hash oracle (dev tool, not part
of the shipped library; driver-side python per the environment contract).

For every text in every /root/testdata/sf*/documents.parquet, compute the
RAW-DEFLATE (wbits=-15, level 6 — the exact twin of the engine's
java.util.zip.Deflater(6, nowrap=true) in expressions/DeflatedLength)
output length with PYTHON'S zlib — an implementation independent of the
JVM — keyed by md5(text) so one fixture serves any scale factor: the
DuckDB oracle joins documents on md5(d.text) = f.text_md5 and needs no
knowledge of which sf dir the verify ran against.

Output: fixtures/deflate_expected.parquet (text_md5 VARCHAR,
deflated_len BIGINT), deduped by md5.
"""
import glob
import hashlib
import os
import zlib

import duckdb

out_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
os.makedirs(out_dir, exist_ok=True)
out = os.path.abspath(os.path.join(out_dir, "deflate_expected.parquet"))

rows = {}
for p in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
    con = duckdb.connect()
    for (text,) in con.sql(f"SELECT text FROM '{p}' WHERE text IS NOT NULL").fetchall():
        data = text.encode("utf-8")
        md5 = hashlib.md5(data).hexdigest()
        if md5 in rows:
            continue
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        rows[md5] = len(c.compress(data) + c.flush())
    print(f"{p}: cumulative {len(rows)} distinct texts")

con = duckdb.connect()
con.execute("CREATE TABLE f (text_md5 VARCHAR, deflated_len BIGINT)")
con.executemany("INSERT INTO f VALUES (?, ?)", list(rows.items()))
con.execute(f"COPY (SELECT * FROM f ORDER BY text_md5) TO '{out}' (FORMAT PARQUET)")
print(f"wrote {out} ({len(rows)} rows)")
