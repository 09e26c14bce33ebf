#!/usr/bin/env python3
"""Local stand-in for the driver's CORRECTNESS gate: run each oracle_sql in
DuckDB over the sf tables, load the matching Spark parquet dump, normalize
(sort columns by name, sort rows), and diff. Usage:
    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out [name...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"MISS  {name}: no spark output")
        fails.append(name); continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ORERR {name}: {str(e)[:160]}")
        fails.append(name); continue
    got = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"COLS  {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
        fails.append(name); continue
    if len(exp) != len(got):
        print(f"ROWS  {name}: oracle={len(exp)} spark={len(got)}")
        fails.append(name); continue
    key = list(exp.columns)
    exp = exp.sort_values(key, ignore_index=True)
    got = got.sort_values(key, ignore_index=True)

    # Normalize representation-only dtype differences the driver's hash also
    # tolerates (integer WIDTH: Spark int32 vs DuckDB int64; timestamp UNIT:
    # parquet ns vs DuckDB us) but keep KIND differences fatal — e.g. DuckDB
    # sum(BIGINT)->HUGEINT->float64 vs Spark int64 is exactly the class the
    # driver gates on and check_dtype=False used to hide.
    def norm(df):
        for c in df.columns:
            dt = df[c].dtype
            if pd.api.types.is_integer_dtype(dt):
                df[c] = df[c].astype("Int64" if df[c].isna().any()
                                     or str(dt).startswith("Int") else "int64")
            elif pd.api.types.is_datetime64_any_dtype(dt):
                s = df[c]
                if getattr(s.dtype, "tz", None) is not None:
                    # tz-aware astype to naive raises; normalize via UTC
                    s = s.dt.tz_convert("UTC").dt.tz_localize(None)
                df[c] = s.astype("datetime64[ns]")
        return df
    try:
        pd.testing.assert_frame_equal(norm(exp), norm(got), check_exact=True)
        print(f"OK    {name} ({len(exp)} rows)")
    except AssertionError as e:
        print(f"DIFF  {name}: {str(e).splitlines()[-1][:200]}")
        fails.append(name)
checked = [n for n in oracle if not only or n in only]
print(f"\n{len(checked) - len(fails)}/{len(checked)} green" +
      (" (subset)" if only else "") +
      (f"; failing: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
