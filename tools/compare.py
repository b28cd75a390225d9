#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
and compares: columns sorted by name, rows sorted by all columns, exact value
equality (no tolerance — the engine is designed for bit parity).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import os
    for t in TABLES:
        # driver testdata is one file per table; graft.ScaleUp replicas are
        # Spark-written directories — glob the parts in that case
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # events.ts arrives as TIMESTAMP in the driver testdata but as raw
    # nanos BIGINT in graft.ScaleUp replicas (mirroring the nanos
    # generation); mirror Engine.readEvents' schema-adaptive truncation
    # so the oracles always see a µs TIMESTAMP.
    ts_type = con.execute(
        "SELECT data_type FROM information_schema.columns "
        "WHERE table_name='events' AND column_name='ts'").fetchone()[0]
    if ts_type == "BIGINT":
        ev = f"{sf_dir}/events.parquet"
        if os.path.isdir(ev):
            ev = f"{ev}/*.parquet"
        con.execute("CREATE OR REPLACE VIEW events AS SELECT event_id, "
                    "make_timestamp(ts // 1000) AS ts, user_id, event_type, "
                    f"value, props FROM '{ev}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    import os
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    # a query that threw inside graft.Verify writes no output dir — that
    # must FAIL the gate, not silently shrink coverage
    missing = sorted(set(oracles) - set(dirs))
    for name in missing:
        if only and name not in only:
            continue
        print(f"FAIL {name}: no Verify output directory (query threw?)")
        n_fail += 1
    for name in dirs:
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "rows-only"
            ok = len(got) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} ({status}, rows={len(got)})")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if g.shape != e.shape:
            print(f"FAIL {name}: shape {g.shape} vs {e.shape}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_exact=True, check_dtype=False)
            # dtype check reported separately (driver may compare schemas)
            dtw = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                   if str(g[c].dtype) != str(e[c].dtype)]
            msg = f" [dtype-warn: {dtw}]" if dtw else ""
            print(f"PASS {name} (rows={len(g)}){msg}")
            n_pass += 1
        except AssertionError as ex:
            n_fail += 1
            diff_cols = []
            for c in g.columns:
                if not g[c].equals(e[c]):
                    diff_cols.append(c)
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:3]:
                neq = g[c] != e[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   {c}[{i}]: spark={g[c][i]!r} duckdb={e[c][i]!r}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
