#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the same sf dir, compare to the Spark parquet dump
(columns sorted by name, values compared row-by-row)."""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if prefixes:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            try:
                import numpy as np
                # The driver's hash is type-sensitive: an int64 Spark column vs
                # a HUGEINT/float oracle column mismatches even when every value
                # is equal (this is exactly how q15 hid for two rounds behind the
                # old atol=1e-9 + dtype-coercing compare). Both frames come out
                # of the same DuckDB fetchdf, so dtype kinds are comparable.
                if ev.dtype.kind != gv.dtype.kind:
                    bad = (c, 'dtype', ev.dtype, gv.dtype, -1); break
                if ev.dtype.kind == 'f':
                    e2 = ev.astype(float); g2 = gv.astype(float)
                    # exact — queries round() what they emit; a last-bit diff
                    # here means the driver's exact hash splits too
                    mism = ~((e2 == g2) | (e2.isna() & g2.isna()))
                else:
                    mism = ev.astype(str) != gv.astype(str)
                if mism.any():
                    i = mism.idxmax()
                    bad = (c, i, ev[i], gv[i], int(mism.sum())); break
            except Exception as e:
                bad = (c, '?', '?', f"cmp error {e}", -1); break
        if bad:
            c, i, e, g, n = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={g!r} ({n} mismatches)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle queries total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional extra args: query-name prefixes to restrict the run (local
    # chunking for long sf1.0 sweeps; the driver passes none)
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
