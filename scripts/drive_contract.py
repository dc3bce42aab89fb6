#!/usr/bin/env python
"""Drive the driver contract (__spark_entry__.py) end-to-end, as the round
driver does: fresh import, entry() smoke, then every queries() entry vs its
oracle_sql() on DuckDB with exact value comparison.

Usage: python scripts/drive_contract.py [--sf sf0.01] [--only name1,name2]
                                         [--skip name1,name2]
                                         [--hostile] [--skewed]
                                         [--driver-memory 1g] [--timings]

--sf also accepts a PATH (anything containing a '/'), so the decade-step
fixtures from make_scale_fixtures.py can be hash-certified, not just
timed: `--sf .scale/sf1` (relative to the repo root) runs the full
oracle gate against the 10x data. Use --skip to carve out keys whose
cost at the target scale is already dispositioned (e.g. q_emb_neardup's
quadratic-by-contract label cells at sf1), and --timings to print
per-key Spark/DuckDB wall-clock so slow keys are attributable.

--hostile builds the SparkSession the way an unhelpful caller would
(America/New_York session timezone, 3 shuffle partitions) instead of
the friendly defaults — every registered query must STILL hash-match,
because the registry wrapper pins UTC per query and no plan may depend
on shuffle width. This is the full-registry version of the curated
tests/test_hostile_session.py list.

--skewed (verdict r9 #3) poisons the DATA instead of the session: the
drive runs against a materialized fixture variant where one hot user
owns ~30% of events and one hot orderkey owns ~10% of lineitem
(scripts/make_skewed_fixtures.py). Oracles are distribution-
independent, so hash mismatches under skew are real divergences.

--driver-memory (verdict r9 #4) caps the driver JVM heap (e.g. 1g) to
certify the bounded-collect contract mechanically: no registered key's
serving collect may OOM a small driver at the tested sf. Requires a
fresh JVM, so it must be passed before any SparkSession exists in the
process (this script guarantees that).
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def compare(sp: pd.DataFrame, dp: pd.DataFrame) -> tuple[bool, bool, bool, str]:
    ok_cols = sorted(sp.columns) == sorted(dp.columns)
    ok_rows = len(sp) == len(dp)
    ok_vals = True
    detail = ""
    if ok_cols and ok_rows:
        sp = sp[sorted(sp.columns)]
        dp = dp[sorted(dp.columns)]
        # normalize array cells (ndarray vs list depending on Arrow) so the
        # repr sort keys are engine-independent
        for df_ in (sp, dp):
            for c in df_.columns:
                if df_[c].dtype == object:
                    df_[c] = df_[c].map(_canon_cell)
        key_s = sp.apply(lambda r: tuple(repr(v) for v in r), axis=1)
        key_d = dp.apply(lambda r: tuple(repr(v) for v in r), axis=1)
        if len(sp):
            sp = sp.iloc[key_s.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
            dp = dp.iloc[key_d.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
        for c in sp.columns:
            a, b = sp[c], dp[c]
            if pd.api.types.is_datetime64_any_dtype(a) or pd.api.types.is_datetime64_any_dtype(b):
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
            else:
                try:
                    b = b.astype(a.dtype)
                except (TypeError, ValueError):
                    pass
            if a.dtype == object or b.dtype == object:
                # array-valued / mixed cells: element-wise exact compare
                # (vector `ne` on ndarray cells raises ambiguous-truth)
                for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
                    if not _cell_eq(x, y):
                        detail += f" [{c}@{i}: {x!r} != {y!r}]"
                        ok_vals = False
                        break
                continue
            eq = a.equals(b)
            if not eq:
                neq = a.ne(b) & ~(a.isna() & b.isna())
                if neq.any():
                    i = int(neq.idxmax())
                    detail += f" [{c}@{i}: {a.iloc[i]!r} != {b.iloc[i]!r}]"
                    ok_vals = False
    return ok_cols, ok_rows, ok_vals, detail


def _canon_cell(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return [_canon_cell(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_canon_cell(x) for x in v]
    if isinstance(v, np.generic):
        return v.item()
    return v


def _cell_eq(x, y) -> bool:
    import numpy as np

    if isinstance(x, (list, tuple, np.ndarray)) or isinstance(
        y, (list, tuple, np.ndarray)
    ):
        x_l = list(x) if isinstance(x, (list, tuple, np.ndarray)) else [x]
        y_l = list(y) if isinstance(y, (list, tuple, np.ndarray)) else [y]
        return len(x_l) == len(y_l) and all(
            _cell_eq(i, j) for i, j in zip(x_l, y_l)
        )
    if x is None or (isinstance(x, float) and pd.isna(x)):
        return y is None or (isinstance(y, float) and pd.isna(y))
    return x == y


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default=None)
    ap.add_argument("--hostile", action="store_true")
    ap.add_argument("--skewed", action="store_true")
    ap.add_argument("--driver-memory", default=None)
    ap.add_argument("--timings", action="store_true")
    ap.add_argument(
        "--duck-mem", default=None,
        help="cap DuckDB memory (e.g. 24GB) and its temp spill at 2x "
        "that; an oracle that blows past the cap fails ITS key loudly "
        "instead of thrashing the disk for hours (sf1-scale runs)",
    )
    ap.add_argument(
        "--max-result-rows", type=int, default=None,
        help="comparator-capacity bound for huge-sf gates: before "
        "hauling a result into the pandas hash-compare, count it; past "
        "this bound record a loud SKIP instead of OOMing the driver. "
        "The ENGINE still ran the query end-to-end (the count executes "
        "the full plan); only the cross-engine value compare is skipped "
        "— a capacity property of the comparison harness, not of the "
        "query (same taxonomy as scale_contract's oracle-capacity "
        "class)",
    )
    ap.add_argument(
        "--skip-scale-contract", action="store_true",
        help="skip the keys the scale-certification contract excuses "
        "from sf1+ hash gates (label-cell quadratic diagnostics + "
        "oracle-capacity keys) — the ONE list lives in "
        "streaming_data_ingestion_spark/scale_contract.py",
    )
    args = ap.parse_args()
    if args.skip_scale_contract:
        import os

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from streaming_data_ingestion_spark.scale_contract import (
            scale_hash_gate_skips,
        )

        contract = ",".join(scale_hash_gate_skips(skewed=args.skewed))
        args.skip = f"{args.skip},{contract}" if args.skip else contract
    if "/" in args.sf:
        import os

        if args.skewed:
            ap.error("--skewed derives its fixture from a NAMED sf "
                     "(e.g. --sf sf0.01); it does not compose with a "
                     "path-form --sf")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sf_dir = args.sf if os.path.isabs(args.sf) else os.path.join(repo, args.sf)
    else:
        sf_dir = f"/root/testdata/{args.sf}"
    if args.skewed:
        import make_skewed_fixtures

        sf_dir = make_skewed_fixtures.build(args.sf)

    mod = load_entry_module()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    if args.driver_memory:
        builder = builder.config("spark.driver.memory", args.driver_memory)
    if args.hostile:
        builder = builder.config(
            "spark.sql.session.timeZone", "America/New_York"
        ).config("spark.sql.shuffle.partitions", "3")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert len(rows) > 0, "entry() produced no rows"

    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle_sql keys must be subset of queries"

    con = duckdb.connect()
    if args.duck_mem:
        import os
        import re as _re

        m = _re.fullmatch(r"(\d+(?:\.\d+)?)\s*(GB|MB|GiB|MiB)", args.duck_mem)
        if not m:
            ap.error("--duck-mem must look like 20GB or 512MB")
        # DuckDB reads GB/MB as decimal and GiB/MiB as binary; mirror that
        # when sizing the 2x temp cap so the cap never undershoots
        # (the cap string below is decimal MB, so binary units convert
        # through 1 MiB = 1.048576 MB)
        unit = m.group(2)
        to_mb = {
            "GB": 1000.0,
            "GiB": 1073.741824,
            "MB": 1.0,
            "MiB": 1.048576,
        }[unit]
        n_mb = float(m.group(1)) * to_mb
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spill = os.path.join(repo, ".tmp", "duckspill")
        # DuckDB does not create the temp_directory's PARENTS: a fresh
        # checkout failed its first actually-spilling key with "Failed
        # to create directory" hours into an sf10 gate
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET memory_limit='{args.duck_mem}'")
        con.execute(f"SET temp_directory='{spill}'")
        con.execute(f"SET max_temp_directory_size='{int(n_mb * 2)}MB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = sorted(qs) if not args.only else args.only.split(",")
    if args.skip:
        skips = set(args.skip.split(","))
        names = [n for n in names if n not in skips]
        print(f"skipping by flag: {sorted(skips & set(qs))}")
    failed = []
    import time as _time

    for name in names:
        t0 = _time.monotonic()
        t_spark = t_duck = 0.0
        try:
            if args.hostile:
                # every query must survive a hostile session ON ITS OWN:
                # the registry wrapper pins UTC when a query is built and
                # the pin is sticky, so without this re-poisoning the
                # first query would shield all later ones from the
                # hostile timezone (the curated hostile tests re-set it
                # per query for the same reason)
                spark.conf.set(
                    "spark.sql.session.timeZone", "America/New_York"
                )
            sdf = qs[name](spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"{name}: rows-only, {n} rows", flush=True)
                continue
            capped = None
            try:
                if args.max_result_rows is not None:
                    # persist so the capacity count and the toPandas
                    # compare share ONE execution — without it every
                    # oracled key ran its full plan twice and --timings
                    # readings doubled
                    capped = sdf.persist()
                    n_rows = capped.count()
                    if n_rows > args.max_result_rows:
                        print(
                            f"{name}: SKIPPED comparator-capacity "
                            f"({n_rows} rows > --max-result-rows "
                            f"{args.max_result_rows}; engine ran "
                            f"end-to-end, hash-compare skipped)",
                            flush=True,
                        )
                        continue
                sp = (capped if capped is not None else sdf).toPandas()
            finally:
                # unpersist even when count/toPandas raises — a leaked
                # cache entry otherwise holds blocks for the rest of a
                # multi-hour capped run (ADVICE r12)
                if capped is not None:
                    capped.unpersist()
            t_spark = _time.monotonic() - t0
            dp = con.execute(oracles[name]).df()
            t_duck = _time.monotonic() - t0 - t_spark
            ok_cols, ok_rows, ok_vals, detail = compare(sp, dp)
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            timing = (
                f" [spark {t_spark:.1f}s duck {t_duck:.1f}s]"
                if args.timings
                else ""
            )
            print(
                f"{name}: cols={ok_cols} rowcount={ok_rows}({len(sp)}) "
                f"values_exact={ok_vals} {status}{detail}{timing}",
                flush=True,
            )
            if status == "FAIL":
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)

    spark.stop()
    if failed:
        print(f"DRIVE FAILED: {failed}")
        return 1
    print("DRIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
