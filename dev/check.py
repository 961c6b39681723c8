#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables and compare with the Spark parquet
dumps produced by graft.Verify. Columns sorted by name, rows sorted, values
hashed. Usage: dev/check.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype).startswith("UInt"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: int(v) if isinstance(v, (np.integer,)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracles):
        if only and name not in only: continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORAERR   {name}: {e}"); fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}")
            fail += 1; continue
        if len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); fail += 1; continue
        if not s.equals(d):
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            print(f"VALUES   {name}: {bad.sum()} mismatched rows of {len(s)}")
            print(pd.concat([s[bad].head(3).add_prefix("s_"),
                             d[bad].head(3).add_prefix("d_")], axis=1))
            fail += 1; continue
        print(f"OK       {name}: {len(s)} rows")
        ok += 1
    # rows-only queries (no oracle)
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res_dir.rstrip("/"))
        if name in oracles: continue
        if only and name not in only: continue
        files = glob.glob(f"{res_dir}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWSONLY' if n > 0 else 'EMPTY   '} {name}: {n} rows")
        if n == 0: fail += 1
    print(f"\n{ok} oracle-ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
