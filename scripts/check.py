#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify.scala output dir (parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares:
row count, schema (column names), and value hash with columns sorted by
name. Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # repr of float is exact round-trip; bit-level compare
        return repr(val)
    return repr(val)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return canon_rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            # mirror the Spark loader seam (Tables.documents): vertical
            # tab -> space, so both engines tokenize/hash the identical
            # normalized text on ANY corpus bytes (no-op on the VT-free
            # driver corpus)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE "
                f"(replace(text, chr(11), ' ') AS text) "
                f"FROM '{sf_dir}/{t}.parquet'")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_types = [str(d[1]) for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.sql(sql)
            ora_cols = [d[0] for d in ora_rel.description]
            ora_types = [str(d[1]) for d in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        # dtype-aware: the driver hashes typed values, so a HUGEINT oracle
        # vs BIGINT spark column fails there even when repr() matches here.
        spark_tm = dict(zip(spark_cols, spark_types))
        ora_tm = dict(zip(ora_cols, ora_types))
        dt_bad = [(c, spark_tm[c], ora_tm[c]) for c in spark_cols if spark_tm[c] != ora_tm[c]]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (col, spark, oracle): {dt_bad}")
            n_fail += 1
            continue
        if len(spark_rows) != len(ora_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(ora_rows)}")
            n_fail += 1
            continue
        a, b = frame_key(spark_rows, spark_cols), frame_key(ora_rows, ora_cols)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
