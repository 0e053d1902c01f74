import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r4"
oracle = json.load(open(f"{out}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes: everything to string repr with float rounding
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)): return "NULL"
        if isinstance(v, float): return f"{v:.9g}"
        if isinstance(v, (np.floating,)): return f"{float(v):.9g}"
        return str(v)
    return [[cell(v) for v in row] for row in df.itertuples(index=False)]

results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    files = sorted(glob.glob(f"{d}/*.parquet"))
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        results[name] = {"status": "rows_only", "rows": len(spark_df)}
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:200]}
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        results[name] = {"status": "SCHEMA_MISMATCH", "spark": s_cols, "duck": d_cols}
        continue
    dt_bad = [c for c in s_cols
              if (str(spark_df[c].dtype).startswith("int") and str(duck_df[c].dtype).startswith("float"))
              or (str(spark_df[c].dtype).startswith("float") and str(duck_df[c].dtype).startswith("int"))]
    if dt_bad:
        results[name] = {"status": "DTYPE_MISMATCH",
                         "cols": {c: [str(spark_df[c].dtype), str(duck_df[c].dtype)] for c in dt_bad}}
        continue
    if len(spark_df) != len(duck_df):
        results[name] = {"status": "ROWCOUNT_MISMATCH", "spark": len(spark_df), "duck": len(duck_df)}
        continue
    a, b = canon(spark_df), canon(duck_df)
    if a == b:
        results[name] = {"status": "MATCH", "rows": len(spark_df)}
    else:
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        results[name] = {"status": "HASH_MISMATCH", "rows": len(spark_df), "first_diffs": diffs}

ok = sum(1 for r in results.values() if r["status"] == "MATCH")
ro = sum(1 for r in results.values() if r["status"] == "rows_only")
bad = {k: v for k, v in results.items() if v["status"] not in ("MATCH", "rows_only")}
print(f"MATCH: {ok}  rows_only: {ro}  BAD: {len(bad)}")
for k, v in bad.items():
    print(k, json.dumps(v, default=str)[:600])
for k, v in results.items():
    if v["status"] == "rows_only":
        print("rows_only:", k, v["rows"])
