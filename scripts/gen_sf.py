#!/usr/bin/env python3
"""Deterministic scale-up generator: sf0.1 -> sfN (default 10x -> "sf1").

Usage: python3 scripts/gen_sf.py [srcdir] [outdir] [multiplier]

Deterministic as a MULTISET: every cell value is a pure function of
the source and the multiplier, but row order within files may vary
run-to-run (COPY streams with preserve_insertion_order=false so large
multipliers don't buffer the whole result in memory). Every consumer
(gate sorts rows, bench scans) is order-insensitive.

Replication scheme (honest linear scale-up, no synthetic skew):
- region/nation: fixed dims, copied verbatim.
- keyed fact/dim tables (customer/supplier/part/orders/lineitem,
  events): replica i offsets every key by i * (max_key + 1) of its key
  family, so per-key join fanout, group cardinality ratios, and skew
  shape are EXACTLY those of sf0.1 while totals grow by the
  multiplier. Replica-local joins stay intact (orders replica i joins
  customer replica i).
- documents: replica i > 0 prefixes every non-space run with "r{i}_"
  via a whitespace-preserving regex substitution (runs, tabs,
  newlines, edges, and empty docs survive byte-for-byte), giving each
  replica a disjoint vocabulary — replicas are
  NOT near-duplicates of each other (a bare copy would hand every doc
  a 10-member duplicate cluster and make pair counts quadratic in the
  multiplier, which is a different experiment). Within a replica the
  near-dup structure of sf0.1 is preserved, so dedup-family outputs
  scale linearly. n_chars is recomputed for the rewritten text.
- embeddings: replica i > 0 applies a deterministic per-replica
  diagonal map (dim d scaled by 1 + 0.25*(((31*d + 17*i) % 7) - 3),
  sign-flipped when (11*d + 13*i) % 5 == 0); cosine is
  scale-invariant, so a strong direction-changing map is required —
  a mild one leaves replicas at cosine ~0.995 to their originals,
  inside the 0.99 near-dup threshold, which would hand every vector
  9 synthetic near-dups and make pair counts quadratic in the
  multiplier. With the flips, replica-to-original cosine lands around
  0.4-0.6. Labels unchanged.

All timestamps keep their source parquet logical types (events.ts is
TIMESTAMP_NS; the Spark side reads it as nanos-long via
spark.sql.legacy.parquet.nanosAsLong, and the DuckDB oracles use
epoch_ns) — that is why this generator is DuckDB, not Spark: a Spark
rewrite would down-convert the nanos column.
"""
import os
import sys

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # COPY buffers the ENTIRE result in memory when insertion order is
    # preserved — at multiplier 1000 the lineitem cross join is 600M
    # rows and was observed parked at 100 GB resident writing nothing.
    # Row order carries no meaning here (the gate sorts rows, the bench
    # scans), so let COPY stream; content is the same multiset.
    con.execute("SET preserve_insertion_order = false")
    # DuckDB's default cap is 80% of RAM; raise it only as far as the
    # MACHINE allows (a fixed '48GB' told a smaller box it had memory
    # it didn't, turning safe spill-to-disk into an OOM kill)
    phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    con.execute(f"SET memory_limit = '{min(48 * 1024**3, int(phys * 0.8)) // 1024**2}MB'")

    def t(name):
        return f"'{src}/{name}.parquet'"

    def write(name, sql, row_group=0):
        opts = f", ROW_GROUP_SIZE {row_group}" if row_group else ""
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET{opts})")
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # key-family offsets = max + 1 from the SOURCE, so every replica's
    # key block is disjoint
    off = {}
    for table, col in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                       ("part", "p_partkey"), ("orders", "o_orderkey"),
                       ("events", "event_id"), ("documents", "doc_id"),
                       ("embeddings", "vec_id")]:
        off[col] = con.execute(f"SELECT max({col}) + 1 FROM {t(table)}").fetchone()[0]
    off["user_id"] = con.execute(f"SELECT max(user_id) + 1 FROM {t('events')}").fetchone()[0]

    rep = f"(SELECT unnest(range({mult})) AS i)"

    write("region", f"SELECT * FROM {t('region')}")
    write("nation", f"SELECT * FROM {t('nation')}")
    write("customer", f"""
        SELECT c_custkey + i * {off['c_custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')} CROSS JOIN {rep}""")
    write("supplier", f"""
        SELECT s_suppkey + i * {off['s_suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {t('supplier')} CROSS JOIN {rep}""")
    write("part", f"""
        SELECT p_partkey + i * {off['p_partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')} CROSS JOIN {rep}""")
    write("orders", f"""
        SELECT o_orderkey + i * {off['o_orderkey']} AS o_orderkey,
               o_custkey + i * {off['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')} CROSS JOIN {rep}""")
    write("lineitem", f"""
        SELECT l_orderkey + i * {off['o_orderkey']} AS l_orderkey,
               l_partkey + i * {off['p_partkey']} AS l_partkey,
               l_suppkey + i * {off['s_suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')} CROSS JOIN {rep}""")
    # events via pyarrow to preserve the source ts unit exactly: the
    # driver has shipped ts as TIMESTAMP(NANOS) (sub-micro precision,
    # which this DuckDB build would truncate to micros) and as
    # TIMESTAMP(MICROS) in different rounds — pyarrow replication
    # keeps whichever unit the source carries, and the Spark loader
    # (Tables.tsAsNanos) normalizes both to epoch-nanos longs
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{src}/events.parquet")
    # stream one replica at a time through a single ParquetWriter —
    # memory stays O(one replica) at any multiplier; bounded row
    # groups because a single-row-group file cannot be split across
    # scan tasks no matter what maxPartitionBytes says
    writer = pq.ParquetWriter(f"{out}/events.parquet", ev.schema,
                              coerce_timestamps=None, version="2.6")
    for i in range(mult):
        rep_tbl = ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ev.column("event_id"), i * off["event_id"])
        ).set_column(
            ev.schema.get_field_index("user_id"), "user_id",
            pc.add(ev.column("user_id"), i * off["user_id"]))
        writer.write_table(rep_tbl, row_group_size=65536)
    writer.close()
    n = con.execute(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
    print(f"events: {n} rows")
    # token prefixing is a pure regex substitution on non-space runs:
    # whitespace (runs, tabs, newlines, leading/trailing) is preserved
    # byte-for-byte and empty/whitespace-only docs stay empty, so
    # whitespace-sensitive counters (edge tokens, punct ratios,
    # n_chars deltas) keep the sf-source structure in every replica
    write("documents", f"""
        SELECT doc_id + i * {off['doc_id']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)',
                           'r' || CAST(i AS VARCHAR) || '_\\1', 'g')
               END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE CAST(length(regexp_replace(text, '(\\S+)',
                           'r' || CAST(i AS VARCHAR) || '_\\1', 'g')) AS BIGINT)
               END AS n_chars
        FROM {t('documents')} CROSS JOIN {rep}""", row_group=8192)
    write("embeddings", f"""
        SELECT vec_id + i * {off['vec_id']} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE CAST(list_transform(list_zip(embedding,
                        range(1, len(embedding) + 1)),
                      -- replicas 1-9 keep the original affine map (sf1
                      -- outputs stay bit-identical); replicas >= 10 mix
                      -- (i, dim) through hash() so every replica gets a
                      -- DISTINCT diagonal map — the affine family has
                      -- only 35 members (i mod 7, i mod 5), so at
                      -- mult=100 pigeonhole made some replicas exact
                      -- cosine twins and dedup_embedding_cosine
                      -- measured a synthetic quadratic blowup at sf10
                      z -> z[1]
                        * (1 + 0.25 * ((CASE WHEN i < 10
                            THEN (31 * (z[2] - 1) + 17 * i) % 7
                            ELSE CAST(hash(i * 131071 + z[2]) % 7 AS BIGINT)
                            END) - 3))
                        * (CASE WHEN (CASE WHEN i < 10
                            THEN (11 * (z[2] - 1) + 13 * i) % 5
                            ELSE CAST(hash(i * 524287 + z[2]) % 5 AS BIGINT)
                            END) = 0
                            THEN -1 ELSE 1 END))
                      AS FLOAT[])
               END AS embedding,
               label
        FROM {t('embeddings')} CROSS JOIN {rep}""", row_group=4096)
    print(f"done -> {out} (x{mult})")


if __name__ == "__main__":
    main()
