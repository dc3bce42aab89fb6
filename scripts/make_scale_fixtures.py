#!/usr/bin/env python
"""Materialize an sf1-equivalent fixture set (verdict r9 #2).

Every scale claim past sf0.1 (~600 k lineitem rows) was design-argument
+ plan-assertion; this builds a 10× data set locally so the heavy-tail
keys can be MEASURED at the next decade. The driver's fixtures are
read-only and capped at sf0.1, so the decade step is derived from
sf0.1 by replication with deterministic key/content remapping —
DuckDB single-pass COPYs, no RNG, byte-stable across runs:

* ``lineitem`` / ``orders``: 10 replicas, orderkeys offset per replica
  (FKs hold: o_custkey / l_partkey / l_suppkey still reference the
  unscaled dimension tables, exactly like TPC-H holds nation/region
  fixed while facts grow);
* ``events``: 10 replicas, event_id offset, ts/user_id kept — users
  get 10× deeper histories (the realistic growth axis for the
  session/window family);
* ``documents``: 10 replicas, doc_id offset, every token suffixed with
  the replica ordinal — replicas are DISSIMILAR (cross-replica Jaccard
  ≈ 0), so dedup/LSH collision groups stay sf0.1-sized and the
  measured growth is the engine's scaling, not a synthetic 10-way
  duplicate blowup that no real corpus has;
* ``embeddings``: 10 replicas, vec_id offset, each replica's vector
  ROTATED by 7·i positions (norm-preserving) plus a small offset on
  its leading dims — replicas of one base vector decorrelate instead
  of sitting coincident in embedding space. (The first cut used the
  offset alone: 10 near-identical copies of every vector made the
  near-dup cell sizes grow 10×, i.e. candidate PAIRS grew 100×, and
  the sf1 stress measured that synthetic blowup instead of engine
  scaling — no real corpus decade-steps by exact replication.);
* dimension tables (region/nation/customer/supplier/part): copied.

Usage: python scripts/make_scale_fixtures.py [--from sf0.1] [--factor 10]
Writes to <repo>/.scale/sf1/ (gitignored). ~1 GiB, a few minutes.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DIMS = ["region", "nation", "customer", "supplier", "part"]


def build(src_sf: str = "sf0.1", factor: int = 10, dest_name: str = "sf1") -> str:
    # a src with "/" is a PATH (repo-relative or absolute), so decade
    # steps can chain: build("sf0.1") -> .scale/sf1, then
    # build(".scale/sf1", dest_name="sf10") -> the second decade
    if "/" in src_sf:
        src = src_sf if os.path.isabs(src_sf) else os.path.join(HERE, src_sf)
    else:
        src = f"/root/testdata/{src_sf}"
    dest = os.path.join(HERE, ".scale", dest_name)
    done = os.path.join(dest, "_SCALE_DONE")
    if os.path.exists(done):
        return dest
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)

    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 2)}")
    for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{src}/{t}.parquet')"
        )

    for t in DIMS:
        con.execute(f"COPY {t} TO '{dest}/{t}.parquet' (FORMAT PARQUET)")

    okey_span = con.execute(
        "SELECT MAX(o_orderkey) + 1 FROM orders"
    ).fetchone()[0]
    ekey_span = con.execute(
        "SELECT MAX(event_id) + 1 FROM events"
    ).fetchone()[0]
    dkey_span = con.execute("SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0]
    vkey_span = con.execute(
        "SELECT MAX(vec_id) + 1 FROM embeddings"
    ).fetchone()[0]

    rep = f"range({factor}) AS r(i)"

    con.execute(f"""
        COPY (
          SELECT o_orderkey + r.i * {okey_span} AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM orders, {rep}
        ) TO '{dest}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT l_orderkey + r.i * {okey_span} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM lineitem, {rep}
        ) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT event_id + r.i * {ekey_span} AS event_id, ts, user_id,
                 event_type, value, props
          FROM events, {rep}
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT doc_id + r.i * {dkey_span} AS doc_id,
                 CASE WHEN r.i = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || CAST(r.i AS VARCHAR)), ' ')
                 END AS text,
                 lang, source,
                 CASE WHEN r.i = 0 THEN n_chars
                      ELSE CAST(length(array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || CAST(r.i AS VARCHAR)), ' '))
                        AS BIGINT)
                 END AS n_chars
          FROM documents, {rep}
        ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + r.i * {vkey_span} AS vec_id,
                 CAST(list_transform(
                   list_concat(embedding[(r.i * 7) % 64 + 1:],
                               embedding[1:(r.i * 7) % 64]),
                   (x, j) -> CASE WHEN j <= 2
                             THEN CAST(x + r.i * 0.07 AS FLOAT)
                             ELSE x END) AS FLOAT[]) AS embedding,
                 label
          FROM embeddings, {rep}
        ) TO '{dest}/embeddings.parquet' (FORMAT PARQUET)
    """)

    counts = {}
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        counts[t] = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}/{t}.parquet')"
        ).fetchone()[0]
    with open(done, "w") as fh:
        fh.write(f"from={src_sf} factor={factor} counts={counts}\n")
    print(f"scale fixtures at {dest}: {counts}")
    return dest


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src_sf", default="sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--dest", default="sf1")
    args = ap.parse_args()
    build(args.src_sf, args.factor, args.dest)
    sys.exit(0)
