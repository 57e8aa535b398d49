#!/usr/bin/env python3
"""Dev-only oracle comparator (mimics the driver's DuckDB check).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs oracle_sql.json[name]
in DuckDB with views over sfDir's parquet tables, then compares:
column names (sorted), row counts, and an order-insensitive value hash
with values normalized (floats rounded repr, dates/timestamps as ISO).
NOT part of the shipped library — local testing aid only.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.map(lambda x: None if pd.isna(x) else repr(float(x)))
        elif s.dtype.kind in "iu":
            out[c] = s.map(lambda x: None if pd.isna(x) else str(int(x)))
        elif s.dtype.kind == "M":
            # Midnight-only timestamps normalize to date-only ISO so a
            # parquet date32 read back as datetime.date (object dtype) and
            # a DuckDB DATE fetched as datetime64 hash identically.
            out[c] = s.map(lambda x: None if pd.isna(x) else (
                t.date().isoformat() if (t := pd.Timestamp(x)) == t.normalize()
                else t.isoformat()))
        else:
            out[c] = s.map(lambda x: None if x is None else (
                x.isoformat() if hasattr(x, "isoformat") else str(x)))
    n = pd.DataFrame(out)
    n = n.sort_values(by=list(n.columns), na_position="first").reset_index(drop=True)
    return n

def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update(("\x01".join("" if v is None else str(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        gc, oc = sorted(got.columns), sorted(oracle.columns)
        if gc != oc:
            print(f"FAIL {name}: columns {gc} vs {oc}"); n_fail += 1; continue
        if len(got) != len(oracle):
            print(f"FAIL {name}: rows {len(got)} vs {len(oracle)}"); n_fail += 1; continue
        gn, on = norm_df(got), norm_df(oracle)
        gh, oh = df_hash(gn), df_hash(on)
        if gh != oh:
            diff = gn.compare(on) if gn.shape == on.shape else None
            print(f"FAIL {name}: hash mismatch")
            if diff is not None and len(diff):
                print(diff.head(10))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
