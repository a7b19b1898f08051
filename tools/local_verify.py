#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables, and
compares: schema (column names, sorted), row count, and a hash of all values
with columns sorted by name. Exits nonzero if any query mismatches.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str).to_numpy()
            h.update("\x00".join(vals).encode())
        else:
            arr = s.to_numpy()
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # unify dtypes across engines: ints -> int64, float32 stays float32,
    # bools -> bool, timestamps -> int64 ns
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            out[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == np.float32:
            out[c] = s
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s
    return pd.DataFrame(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            failures += 1
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        s, d = normalize(canon(spark_df)), normalize(canon(duck_df))
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        for c in s.columns:
            if str(s[c].dtype) != str(d[c].dtype):
                print(f"  note {name}.{c}: dtype spark={s[c].dtype} duck={d[c].dtype}")
        hs, hd = df_hash(s), df_hash(d)
        if hs != hd:
            # locate first differing cell for debugging
            print(f"FAIL {name}: hash mismatch ({len(s)} rows)")
            for c in s.columns:
                a, b = s[c].to_numpy(), d[c].to_numpy()
                if s[c].dtype == object:
                    neq = a.astype(str) != b.astype(str)
                else:
                    neq = ~(a == b)
                if neq.any():
                    i = int(np.argmax(neq))
                    print(f"    col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
                          f" ({int(neq.sum())} diffs)")
            failures += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
