#!/usr/bin/env python3
"""Adversarial-input generators for the robustness sweeps.

Usage: python3 scripts/gen_adversarial.py <mode> [srcdir] [outdir]
  mode in {empty, nulls, dup, unicode, nonfinite}

Each mode derives a full 10-table dataset from a driver testdata dir
(default /root/testdata/sf0.001) that stresses one failure axis, then
the sweep is simply the Verify main pointed at it:

  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <outdir> /tmp/vout"

A query failure line ([verify] <name> failed: ...) is a finding unless
it is one of the intentional loud require() guards (model training and
z-order need data). The round-8 sweeps with these generators found and
fixed eight crash classes: the CDC/SCD2 NULL-max key probe, the
unreadable empty partitioned write, NULL-vector NPEs across the
ANN/cluster family, the BPE encoder's NULL-tokens UDF NPE, the media
decode stub's NULL-payload NPE, and weighted sampling's ANSI
divide-by-zero on zero-length text.

- empty:   every table zero rows (schema preserved) — first-run
           datasets, fully-filtered partitions.
- nulls:   NULL/empty/whitespace text, NULL embedding vectors, NULL
           event values/types, NULL string columns in lineitem.
- dup:     documents collapse to 20 distinct texts, embeddings to 5
           distinct vectors (duplicate-cluster explosion probes the
           candidate caps), every event owned by ONE whale user
           (per-key state bounds).
- unicode: pathological text — emoji/surrogate pairs, CJK without
           whitespace, combining marks/zalgo, RTL, a 2 KB single
           token, embedded control characters.
- nonfinite: NaN/±Infinity in events.value, lineitem prices, and
           embedding elements — crashes found: an MMR argmax that
           indexed -1 when every score was NaN, and ANSI
           CAST_OVERFLOW at every money/metric quantization boundary
           (now routed through Guards.finiteOrNull) plus non-finite
           vectors poisoning centroid/kmeans sums (now dropped at the
           embeddings source with the nulls).
"""
import os
import sys

import duckdb


PATHOLOGICAL = [
    "emoji soup \U0001F600\U0001F680\U0001F984 and flags "
    "\U0001F1FA\U0001F1F8\U0001F1EF\U0001F1F5 mixed with text",
    "CJK 深度学习模型训练数据管道 no spaces at all here",
    "combining áéíóú diacritics ñ and zalgo h̷̓ë̴́l̴͐l̶ͅo̷̅",
    "RTL שלום مرحبا mixed with LTR text",
    "averyverylongsingletokenwithoutanywhitespace" * 50,
    "tabs\tand\nnewlines\r\nand\x0bvertical\x0ctabs",
    "math \U0001D504\U0001D505\U0001D506 and surrogates \U0010FFFF boundary",
    "  leading and trailing whitespace   ",
]

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def copy_passthrough(con, src, out, tables):
    for t in tables:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")


def main():
    mode = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_{mode}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    if mode == "empty":
        for t in ALL_TABLES:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    elif mode == "nulls":
        con.execute(f"""COPY (SELECT doc_id,
            CASE WHEN doc_id % 5 = 0 THEN NULL
                 WHEN doc_id % 10 = 1 THEN ''
                 WHEN doc_id % 17 = 2 THEN '   ' ELSE text END AS text,
            CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
            CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS source,
            CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS n_chars
            FROM '{src}/documents.parquet')
            TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        con.execute(f"""COPY (SELECT vec_id,
            CASE WHEN vec_id % 10 = 0 THEN NULL ELSE embedding END AS embedding,
            CASE WHEN vec_id % 19 = 0 THEN NULL ELSE label END AS label
            FROM '{src}/embeddings.parquet')
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        con.execute(f"""COPY (SELECT event_id, ts, user_id,
            CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS event_type,
            CASE WHEN event_id % 9 = 0 THEN NULL ELSE value END AS value,
            CASE WHEN event_id % 21 = 5 THEN NULL ELSE props END AS props
            FROM '{src}/events.parquet')
            TO '{out}/events.parquet' (FORMAT PARQUET)""")
        # null out whichever optional string columns this testdata
        # carries (the schema has varied across driver rounds)
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()]
        repl = [f"CASE WHEN l_orderkey % {23 + 6 * i} = 0 THEN NULL "
                f"ELSE {c} END AS {c}"
                for i, c in enumerate(x for x in ("l_comment", "l_shipmode") if x in cols)]
        sel = "* REPLACE (" + ", ".join(repl) + ")" if repl else "*"
        con.execute(f"COPY (SELECT {sel} FROM '{src}/lineitem.parquet') "
                    f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
        copy_passthrough(con, src, out,
                         ["region", "nation", "customer", "supplier", "part", "orders"])

    elif mode == "dup":
        con.execute(f"""COPY (SELECT doc_id,
            'duplicate corpus text variant number ' || CAST(doc_id % 20 AS VARCHAR)
              || ' with some shared filler words repeated across the whole corpus'
              || ' to make shingles collide' AS text,
            lang, source, 150::BIGINT AS n_chars
            FROM '{src}/documents.parquet')
            TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        # anchor the 5 donor vectors at the ACTUAL minimum vec_id — a
        # 1-based or sparse id domain would otherwise silently drop
        # whole residue classes through the inner join
        con.execute(f"""COPY (
            WITH lo AS (SELECT min(vec_id) AS m FROM '{src}/embeddings.parquet')
            SELECT e.vec_id, d.embedding, e.label
            FROM '{src}/embeddings.parquet' e
            JOIN lo ON TRUE
            JOIN '{src}/embeddings.parquet' d ON d.vec_id = lo.m + (e.vec_id % 5))
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        n_src = con.execute(
            f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
        if n_out != n_src:
            print(f"WARNING: dup embeddings dropped rows ({n_src} -> {n_out}): "
                  "sparse vec_id domain — donor ids missing")
        con.execute(f"""COPY (SELECT event_id, ts, 42::BIGINT AS user_id,
            event_type, value, props
            FROM '{src}/events.parquet')
            TO '{out}/events.parquet' (FORMAT PARQUET)""")
        copy_passthrough(con, src, out,
                         ["region", "nation", "customer", "supplier", "part",
                          "orders", "lineitem"])

    elif mode == "unicode":
        vals = ",".join(
            "(%d, '%s')" % (i, t.replace("'", "''"))
            for i, t in enumerate(PATHOLOGICAL))
        con.execute(f"""COPY (
            SELECT d.doc_id,
              CASE WHEN d.doc_id % 3 = 0 THEN p.t ELSE d.text END AS text,
              d.lang, d.source,
              length(CASE WHEN d.doc_id % 3 = 0 THEN p.t ELSE d.text END)::BIGINT AS n_chars
            FROM '{src}/documents.parquet' d
            JOIN (SELECT * FROM (VALUES {vals}) v(i, t)) p ON p.i = d.doc_id % 8)
            TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        copy_passthrough(con, src, out,
                         ["region", "nation", "customer", "supplier", "part",
                          "orders", "lineitem", "events", "embeddings"])

    elif mode == "nonfinite":
        con.execute(f"""COPY (SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 17 = 0 THEN 'nan'::DOUBLE
                 WHEN event_id % 23 = 1 THEN 'infinity'::DOUBLE
                 WHEN event_id % 23 = 2 THEN '-infinity'::DOUBLE
                 ELSE value END AS value, props
            FROM '{src}/events.parquet')
            TO '{out}/events.parquet' (FORMAT PARQUET)""")
        con.execute(f"""COPY (SELECT * REPLACE (
            CASE WHEN l_orderkey % 31 = 0 THEN 'nan'::DOUBLE
                 ELSE l_extendedprice END AS l_extendedprice)
            FROM '{src}/lineitem.parquet')
            TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
        con.execute(f"""COPY (SELECT vec_id,
            CASE WHEN vec_id % 15 = 0 THEN list_transform(embedding, x -> 'nan'::FLOAT)
                 WHEN vec_id % 15 = 1 THEN list_transform(embedding, x -> 'infinity'::FLOAT)
                 ELSE embedding END AS embedding, label
            FROM '{src}/embeddings.parquet')
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        copy_passthrough(con, src, out,
                         ["region", "nation", "customer", "supplier", "part",
                          "orders", "documents"])

    else:
        sys.exit(f"unknown mode {mode!r} (empty|nulls|dup|unicode|nonfinite)")

    print(f"done -> {out} ({mode})")


if __name__ == "__main__":
    main()
