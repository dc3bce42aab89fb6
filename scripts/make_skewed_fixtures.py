#!/usr/bin/env python
"""Materialize a SKEWED variant of a fixture directory (verdict r9 #3).

The --hostile drive poisons the SESSION; nothing yet poisons the DATA.
This writes a copy of an sf dir where the two central keys carry a hot
value — the 100 TB failure mode the uniform bench fixtures cannot
surface:

* ``events``: ~30% of rows are reassigned to ONE hot user_id (the
  sessionize / window / stream-analog family's group key);
* ``lineitem``: ~10% of rows are reassigned to ONE hot l_orderkey (the
  join family's key; l_linenumber is re-minted inside the hot order so
  the (orderkey, linenumber) compound stays unique).

Everything else is copied verbatim. The reassignment is a DETERMINISTIC
pure function of existing key columns (no RNG), so repeated runs are
byte-stable. Correctness oracles are layout- and distribution-
independent — the drive runs the same SQL over the same skewed parquet
— so every hash mismatch under skew is a real engine divergence, not a
fixture artifact.

Usage: python scripts/make_skewed_fixtures.py [--sf sf0.01] [--force]
Writes to <repo>/.scale/<sf>-skew/ (gitignored).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

HOT_USER = 7        # events: receives ~30% of all rows
HOT_ORDER_MOD = 3   # lineitem rows with l_orderkey % 10 == 3 move to the hot key


def skewed_dir(sf: str) -> str:
    return os.path.join(HERE, ".scale", f"{sf}-skew")


def build(sf: str, force: bool = False) -> str:
    src = f"/root/testdata/{sf}"
    if not os.path.isdir(src):
        # decade-step fixtures (sf1, sf10) live under .scale/, built by
        # make_scale_fixtures.py — skewing those closes the
        # mode x scale certification matrix (skewed sf1 cell)
        alt = os.path.join(HERE, ".scale", sf)
        if os.path.isdir(alt):
            src = alt
        else:
            raise SystemExit(
                f"no fixture dir for {sf!r}: neither {src} nor {alt}"
            )
    dest = skewed_dir(sf)
    done_marker = os.path.join(dest, "_SKEW_DONE")
    if os.path.exists(done_marker) and not force:
        return dest
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{src}/{t}.parquet')"
        )

    # hot orderkey: the smallest real orderkey, so the FK into orders holds
    hot_order = con.execute("SELECT MIN(o_orderkey) FROM orders").fetchone()[0]

    transforms = {
        "events": f"""
            SELECT event_id, ts,
                   CASE WHEN event_id % 10 < 3 THEN {HOT_USER}
                        ELSE user_id END AS user_id,
                   event_type, value, props
            FROM events
        """,
        "lineitem": f"""
            SELECT CASE WHEN moved THEN {hot_order} ELSE l_orderkey END
                     AS l_orderkey,
                   l_partkey, l_suppkey,
                   CASE WHEN moved
                        THEN CAST(100000 + ROW_NUMBER() OVER (
                               PARTITION BY moved ORDER BY l_orderkey,
                               l_linenumber, l_partkey) AS INTEGER)
                        ELSE l_linenumber END AS l_linenumber,
                   l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM (SELECT *, l_orderkey % 10 = {HOT_ORDER_MOD} AS moved
                  FROM lineitem)
        """,
    }

    for t in TABLES:
        sel = transforms.get(t, f"SELECT * FROM {t}")
        con.execute(
            f"COPY ({sel}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )

    # record the achieved skew so the drive log shows what was tested
    ev = con.execute(
        f"SELECT COUNT(*) FILTER (user_id = {HOT_USER}) * 1.0 / COUNT(*) "
        f"FROM read_parquet('{dest}/events.parquet')"
    ).fetchone()[0]
    li = con.execute(
        f"SELECT COUNT(*) FILTER (l_orderkey = {hot_order}) * 1.0 / COUNT(*) "
        f"FROM read_parquet('{dest}/lineitem.parquet')"
    ).fetchone()[0]
    with open(done_marker, "w") as fh:
        fh.write(
            f"hot_user={HOT_USER} events_share={ev:.3f} "
            f"hot_order={hot_order} lineitem_share={li:.3f}\n"
        )
    print(
        f"skewed fixtures at {dest}: hot user owns {ev:.1%} of events, "
        f"hot orderkey owns {li:.1%} of lineitem"
    )
    return dest


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    build(args.sf, args.force)
    sys.exit(0)
