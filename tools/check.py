#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares row count, schema (column names), and a hash of
all values (columns sorted by name, rows sorted). Dev-only tool — not part
of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") or (
                df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, (datetime.date, datetime.datetime))).any()):
            df[c] = pd.to_datetime(df[c]).map(
                lambda v: v.isoformat() if pd.notna(v) else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                h.update(b"<null>")
            elif isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        if not parts:
            results[name] = {"status": "NO_SPARK_OUTPUT"}
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if name not in oracle:
            results[name] = {"status": "ROWS_ONLY", "rows": len(spark_df),
                             "ok": len(spark_df) > 0}
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "ORACLE_SQL_ERROR", "err": str(e)[:500]}
            continue
        r = {"status": "COMPARED",
             "rows_spark": len(spark_df), "rows_duck": len(duck_df),
             "rows_match": len(spark_df) == len(duck_df),
             "schema_spark": sorted(spark_df.columns),
             "schema_duck": sorted(duck_df.columns),
             "schema_match": sorted(spark_df.columns) == sorted(duck_df.columns)}
        if r["rows_match"] and r["schema_match"]:
            cs, cd = canon(spark_df), canon(duck_df)
            r["hash_match"] = value_hash(cs) == value_hash(cd)
            if not r["hash_match"]:
                # find first differing cell for debugging
                for col in cs.columns:
                    a, b = cs[col], cd[col]
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        r["first_diff"] = {"col": col, "row": int(i),
                                           "spark": repr(a[i]), "duck": repr(b[i])}
                        break
        results[name] = r
    ok = sum(1 for v in results.values()
             if v.get("hash_match") or (v.get("status") == "ROWS_ONLY" and v.get("ok")))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {ok}/{len(results)} green ==")

if __name__ == "__main__":
    main()
