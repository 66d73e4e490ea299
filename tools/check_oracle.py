#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over the sfDir tables,
then compares schema (column names sorted) and values.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # full precision
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # partial corpora (e.g. the k-limb gate's documents-only dir)
        # only get views for the tables they ship
        if glob.glob(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each entry under both "<name>" and "<name>.parquet"
    # (driver lookup convention); check each query once, by base name.
    oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            duck_df = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        spark_df, duck_df = spark_df[sc], duck_df[sc]
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        s_rows = [tuple(norm_cell(v) for v in r) for r in spark_df.itertuples(index=False)]
        d_rows = [tuple(norm_cell(v) for v in r) for r in duck_df.itertuples(index=False)]
        # driver sorts-then-hashes; require both sorted-equal AND as-is equal
        mism = sum(1 for a, b in zip(sorted(s_rows), sorted(d_rows)) if a != b)
        order_mism = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
        if mism == 0:
            note = "" if order_mism == 0 else f" (row-order differs: {order_mism})"
            print(f"PASS {name}: {len(s_rows)} rows{note}"); n_pass += 1
        else:
            print(f"FAIL {name}: {mism} mismatched rows of {len(s_rows)}")
            for a, b in list(zip(sorted(s_rows), sorted(d_rows)))[:2000]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}"); break
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
