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
    strict = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"{name}: MISSING spark result")
            fail += 1
            continue
        # ONE execution per side: the Arrow table feeds both the value
        # compare (to_pylist — same python-native values fetchall gave)
        # and the STRICT pandas views (to_pandas — the driver's dtype
        # lens), so the recursive-CTE oracles don't run twice.
        try:
            stbl = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").arrow()
            otbl = con.execute(oracle[name]).arrow()
            scols, ocols = stbl.column_names, otbl.column_names
            srows = [tuple(d[c] for c in scols) for d in stbl.to_pylist()]
            orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
        except Exception as e:
            print(f"{name}: ERROR {e}")
            fail += 1
            continue
        # STRICT pre-checks approximating the driver's pandas hash:
        # (a) pandas dtype drift (DuckDB HUGEINT window sums land as
        #     float64 while Spark writes int64 — equal values, different
        #     hash); (b) IEEE -0.0 vs +0.0 (equal under ==, different
        #     bits). Both broke rows in CORRECTNESS_r05; a hit here is
        #     a FAILURE (dedicated exit code 2) — the driver's hash
        #     would reject the row even though values compare equal.
        try:
            import numpy as np

            def family(dt):
                # width drift (int32 vs int64) is benign for the
                # driver's hash — CORRECTNESS_r06 hash-matched
                # row_number int32 against DuckDB BIGINT. What broke
                # r05 was KIND drift: HUGEINT sums surfacing float64
                # against Spark's int64.
                s = str(dt)
                for fam in ("int", "uint", "float", "bool", "datetime"):
                    if s.startswith(fam):
                        return "int" if fam == "uint" else fam
                return s
            sdf = stbl.to_pandas()
            odf = otbl.to_pandas()
            for c in sdf.columns:
                if c in odf.columns and \
                        family(sdf[c].dtype) != family(odf[c].dtype):
                    print(f"{name}: STRICT dtype drift col={c} "
                          f"spark={sdf[c].dtype} oracle={odf[c].dtype}")
                    strict += 1
            for df_, side in ((sdf, "spark"), (odf, "oracle")):
                for c in df_.columns:
                    v = df_[c].values
                    if v.dtype == np.float64:
                        n0 = int(((v == 0) & np.signbit(v)).sum())
                        if n0:
                            print(f"{name}: STRICT {side} col={c} has {n0} -0.0")
                            strict += 1
                    # (c) non-scalar result columns: the driver sorts
                    # result values via pandas before hashing, and
                    # array/struct cells throw "unhashable type:
                    # numpy.ndarray" there (q328/q334 in r08). Any
                    # list/array/dict-valued column is a STRICT hit —
                    # serialize it (array_join / array_to_string) in
                    # BOTH the query and the dual.
                    if v.dtype == object:
                        for x in v:
                            if x is None:
                                continue
                            if isinstance(x, (np.ndarray, list, tuple, dict)):
                                print(f"{name}: STRICT {side} col={c} "
                                      f"non-scalar values ({type(x).__name__}) "
                                      "— driver pandas hash would ERROR")
                                strict += 1
                            break
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
          f"{len(extra)} rows-only, {strict} STRICT hits")
    return 1 if fail else (2 if strict else 0)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
