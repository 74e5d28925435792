#!/usr/bin/env python3
"""Local imitation of the driver's DuckDB-oracle compare (t2 gate).

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir written by graft.Verify, loads the Spark parquet
result and runs the corresponding oracle SQL (oracle_sql.json) in
DuckDB with tables registered as views over <sfDir>/*.parquet, then
compares: column names (sorted), row count, and values (rows sorted,
floats rounded to 6 significant-ish decimals). Prints MATCH/MISMATCH
per query. Dev-side tool only — never a library dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"{name}: MISSING spark result")
            fail += 1
            continue
        try:
            scols = [d[0] for d in con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet') LIMIT 0").description]
            srows = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
            ocols = [d[0] for d in con.execute(oracle[name]).description]
            orows = con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            fail += 1
            continue
        # STRICT pre-checks approximating the driver's pandas hash:
        # (a) pandas dtype drift (DuckDB HUGEINT window sums land as
        #     float64 while Spark writes int64 — equal values, different
        #     hash); (b) IEEE -0.0 vs +0.0 (equal under ==, different
        #     bits). Both broke rows in CORRECTNESS_r05.
        try:
            import numpy as np
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
            odf = con.execute(oracle[name]).df()
            for c in sdf.columns:
                if c in odf.columns and str(sdf[c].dtype) != str(odf[c].dtype):
                    print(f"{name}: STRICT dtype drift col={c} "
                          f"spark={sdf[c].dtype} oracle={odf[c].dtype}")
            for df_, side in ((sdf, "spark"), (odf, "oracle")):
                for c in df_.columns:
                    v = df_[c].values
                    if v.dtype == np.float64:
                        n0 = int(((v == 0) & np.signbit(v)).sum())
                        if n0:
                            print(f"{name}: STRICT {side} col={c} has {n0} -0.0")
        except Exception as e:
            print(f"{name}: STRICT check skipped ({e})")
        sc, sr = normalize(scols, srows)
        oc, orw = normalize(ocols, orows)
        if sc != oc:
            print(f"{name}: MISMATCH cols spark={sc} oracle={oc}")
            fail += 1
        elif len(sr) != len(orw):
            print(f"{name}: MISMATCH rows spark={len(sr)} oracle={len(orw)}")
            fail += 1
        elif sr != orw:
            bad = next(i for i, (a, b) in enumerate(zip(sr, orw)) if a != b)
            print(f"{name}: MISMATCH values at sorted-row {bad}:\n  spark : {sr[bad]}\n  oracle: {orw[bad]}")
            fail += 1
        else:
            print(f"{name}: MATCH ({len(sr)} rows)")
    extra = [d.name for d in Path(out_dir).iterdir()
             if d.is_dir() and d.name not in oracle]
    for name in extra:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{Path(out_dir)/name}/*.parquet')").fetchone()[0]
        print(f"{name}: NO-ORACLE (rows-only check, {n} rows)")
    print(f"== {len(oracle) - fail}/{len(oracle)} oracle queries match, "
          f"{len(extra)} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
