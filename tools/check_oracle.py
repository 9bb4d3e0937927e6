#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir in verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir parquet tables, sorts columns by name, sorts rows,
and compares values (exact for non-floats, tiny epsilon reported for floats).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING OUTPUT  {name}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        want = con.sql(oracle[name]).df()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA MISMATCH {name}: got {list(g.columns)} want {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"ROWS MISMATCH   {name}: got {len(g)} want {len(w)}")
            failures += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    aa, bb = a.astype(float).values, b.astype(float).values
                    mask = ~(np.isclose(aa, bb, rtol=1e-9, atol=1e-12) |
                             (pd.isna(aa) & pd.isna(bb)))
                    exact = (aa == bb) | (pd.isna(aa) & pd.isna(bb))
                    if mask.any():
                        bad.append((c, int(mask.sum()), "VALUE"))
                    elif not exact.all():
                        bad.append((c, int((~exact).sum()), "FLOAT-EPSILON-ONLY"))
                else:
                    av = a.astype(str).values
                    bv = b.astype(str).values
                    neq = av != bv
                    if neq.any():
                        i = neq.argmax()
                        bad.append((c, int(neq.sum()), f"e.g. row {i}: {av[i]!r} vs {bv[i]!r}"))
            except Exception as e:
                bad.append((c, -1, f"compare error: {e}"))
        hard = [b for b in bad if b[2] != "FLOAT-EPSILON-ONLY"]
        if hard:
            print(f"VALUE MISMATCH  {name}: {hard[:3]}")
            failures += 1
        elif bad:
            print(f"WARN eps-only   {name}: {bad[:3]}")
            print(f"OK (eps)        {name}  rows={len(g)}")
        else:
            print(f"OK              {name}  rows={len(g)}")
    print("FAILURES:", failures)
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
