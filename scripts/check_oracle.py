#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>/*.parquet,
and compares: column names (sorted), row count, and values (columns sorted
by name; compared both in emitted order and as a sorted multiset).
"""
import json, sys, math, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return str(v)

def frame_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, rows

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    verdicts = {}
    # per-oracle wall timing (r14 ask #3): the compare took ~35 min on
    # the judge's host and crowds the same driver window Verify lives
    # in — the slowest-10 table below localizes where to put
    # MATERIALIZED hints (DuckDB inlines CTEs per reference, so a small
    # CTE over a heavy prefix referenced N times re-runs the prefix
    # N-fold)
    timings = {}
    t_start = time.time()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).fetchdf()
            sc, sr = frame_key(spark_df)
            dc, dr = frame_key(duck_df)
            # field semantics (r13 advisor): rows_match is a row-COUNT
            # match only (mirroring the driver artifact's shape); value
            # equality is carried by hash_match alone. Consumers must
            # require all three flags (closeout.py does).
            verdicts[name] = {
                "rows_match": len(sr) == len(dr),
                "schema_match": sc == dc,
                "hash_match": sc == dc and sr == dr,
                "spark_rows": len(sr), "oracle_rows": len(dr), "err": None}
            if sc != dc:
                print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
                n_bad += 1
            elif len(sr) != len(dr):
                print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
                n_bad += 1
            elif sr != dr:
                ordered = sorted(map(repr, sr)) == sorted(map(repr, dr))
                tag = "ORDER-ONLY mismatch" if ordered else "VALUE mismatch"
                print(f"FAIL {name}: {tag}")
                for i, (a, b) in enumerate(zip(sr, dr)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                        break
                n_bad += 1
            else:
                print(f"ok   {name} ({len(sr)} rows, {time.time() - t0:.1f}s)")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            verdicts[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "spark_rows": -1,
                              "oracle_rows": -1, "err": str(e)[:200]}
            n_bad += 1
        timings[name] = round(time.time() - t0, 2)
    total = time.time() - t_start
    print(f"== slowest 10 of {len(timings)} (total {total:.0f}s):")
    for name, sec in sorted(timings.items(), key=lambda x: -x[1])[:10]:
        print(f"   {sec:7.1f}s  {name}")
    print(f"== {n_ok} ok, {n_bad} fail")
    if json_out:
        # CORRECTNESS_r{N}.json-shaped dump so scripts/closeout.py can
        # derive the COVERAGE close-out block from a LOCAL verify run
        json.dump(verdicts, open(json_out, "w"), indent=1)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
