"""Synthesize sf1-scale testdata (10x sf0.1) for the scaling bench.

The driver provides sf{0.001,0.01,0.1} only; perf claims measured at
sf0.1 are dominated by Spark's fixed per-job overhead (the judge's
probe: 10x data moved tpch_q1 wall time by -1%). This script builds a
10x corpus so the wall-time-vs-scale curve can be MEASURED where the
data path dominates, per VERDICT r5 item 1.

Method: union each table 10x with replica-shifted keys (offset 10M per
replica, far above any base key) so join fan-outs stay 1:1 and group
cardinalities scale linearly like a real sf1 would:

- region/nation: fixed dims, copied once (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: key columns shifted
  by replica * 10M; FK pairs (orders.custkey, lineitem.orderkey/
  partkey/suppkey) shift together so referential integrity holds.
- documents: doc_id shifted; replicas > 0 get a replica+doc-salted
  token spliced after every 8th token — otherwise every doc would have
  9 exact twins and the dedup/LSH queries would measure a degenerate
  all-duplicates corpus instead of 10x the work (the salt drops
  cross-replica 5-gram Jaccard to ~0.3, below near-dup thresholds).
- embeddings: vec_id shifted; replicas > 0 get deterministic per-dim
  noise (hash of vec_id, dim, replica) — a pure copy would make every
  vector have 9 cosine-identical twins and ANN top-k degenerate.

Output: single parquet file per table (DuckDB COPY), matching the
driver layout so both bench.py's Spark side and its DuckDB baseline
read it unchanged. Deterministic — no RNG, only hashes of ids.

Usage: python tools/make_sf1.py [src_dir] [dest_dir] [key_offset]
         (defaults /root/testdata/sf0.1 -> /root/repo/testdata/sf1)

``key_offset`` must exceed every key in src (default 10M fits the
driver's sf0.1). Chaining (sf1 -> sf10) needs a LARGER offset than
the previous round's max key — sf1 keys reach ~90M, so pass e.g.
1000000000, otherwise replica i of key k collides with replica i+1
of key k-10M (both hit k + (i+1)*10M).
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000  # per-replica key offset, >> any base key
REPLICAS = 10

# table -> list of key columns to shift by replica*OFF
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    global OFF
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
    if len(sys.argv) > 3:
        OFF = int(sys.argv[3])
    # optional 4th arg: comma-separated table subset (e.g. the sf100
    # probe only needs documents,embeddings,events — 10x smaller build)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")

    def copy(select_sql: str, table: str) -> None:
        out = f"{dest}/{table}.parquet"
        con.sql(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    def wanted(t: str) -> bool:
        return only is None or t in only

    for t in COPY_ONCE:
        if not wanted(t):
            continue
        copy(f"SELECT * FROM '{src}/{t}.parquet'", t)

    for t, keys in SHIFT_KEYS.items():
        if not wanted(t):
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c in keys else c for c in cols
        )
        copy(
            f"SELECT {proj} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN range({REPLICAS}) r(i)",
            t,
        )

    # documents: shift doc_id, salt text of replicas > 0 (see module
    # docstring). The salt token encodes (replica, doc_id%97) so any
    # two replicas of the same doc differ from each other too.
    if wanted("documents"):
        copy(
            f"""
        SELECT doc_id + i * {OFF} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(
                          text, '((?:[^ ]+ ){{8}})',
                          '\\1zq' || i || 'x' || (doc_id % 97) || ' ', 'g')
               END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE length(CASE WHEN i = 0 THEN text
                                     ELSE regexp_replace(
                                           text, '((?:[^ ]+ ){{8}})',
                                           '\\1zq' || i || 'x' || (doc_id % 97) || ' ', 'g')
                                END)
               END AS n_chars
        FROM '{src}/documents.parquet' CROSS JOIN range({REPLICAS}) r(i)
        """,
            "documents",
        )

    # embeddings: shift vec_id, per-dim deterministic noise for i > 0
    # (+-3% of the component, hash-seeded): breaks exact twins while
    # keeping the corpus's cosine geometry realistic.
    if wanted("embeddings"):
        copy(
            f"""
        SELECT vec_id + i * {OFF} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE CAST(list_transform(embedding, (x, j) ->
                          x * (1.0 + 0.03 * ((hash(vec_id, j, i) % 1000)
                                             / 1000.0 - 0.5)))
                         AS FLOAT[])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet' CROSS JOIN range({REPLICAS}) r(i)
        """,
            "embeddings",
        )


if __name__ == "__main__":
    main()
