#!/usr/bin/env python3
"""Local dev-loop mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
  2. loads each <outDir>/<name>/ parquet (Spark result)
  3. runs <outDir>/oracle_sql.json[name] in DuckDB with fixture views
  4. compares: column names (sorted), row count, values (exact, with float
     tolerance report so near-misses are visible before they become failures)

This is a dev tool only; the shipped artifact is the Scala library.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    return df


def compare(name, sdf, ddf):
    issues = []
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        return [f"columns differ: spark={scols} duck={dcols}"]
    if len(sdf) != len(ddf):
        issues.append(f"row count differs: spark={len(sdf)} duck={len(ddf)}")
        return issues
    sdf, ddf = canon(sdf), canon(ddf)
    for c in scols:
        a, b = sdf[c], ddf[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                an, bn = a.isna(), b.isna()
                if not an.equals(bn):
                    issues.append(f"col {c}: null mask differs")
                    continue
                av, bv = a[~an].to_numpy(dtype=float), b[~bn].to_numpy(dtype=float)
                if len(av) and not np.array_equal(av, bv):
                    diff = np.abs(av - bv)
                    mx = diff.max()
                    if mx > 0:
                        rel = mx / max(1e-30, np.abs(bv).max())
                        issues.append(
                            f"col {c}: float mismatch max_abs={mx:.3e} rel={rel:.3e}"
                            f" n_diff={(diff > 0).sum()}")
            else:
                aa = a.map(lambda v: str(v))
                bb = b.map(lambda v: str(v))
                if not aa.equals(bb):
                    n = (aa != bb).sum()
                    idx = (aa != bb).idxmax()
                    issues.append(
                        f"col {c}: {n} value diffs; first@{idx}: "
                        f"spark={aa[idx]!r} duck={bb[idx]!r}")
        except Exception as e:
            issues.append(f"col {c}: compare error {e}")
    return issues


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(set(
        [p.split('/')[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith('.json')]))
    npass = nfail = 0
    for name in names:
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        issues = compare(name, sdf, ddf)
        if issues:
            print(f"FAIL {name}:")
            for i in issues:
                print(f"  {i}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            npass += 1
    print(f"\n{npass} pass, {nfail} fail, "
          f"{len(names) - npass - nfail} rows-only")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
