#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev-only tooling;
the shipped library is pure Scala/Spark). Runs each oracle SQL from a
Verify output dir in DuckDB against the same testdata tables, loads the
Spark parquet result, and compares as sorted multisets of rows.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, glob, math, json, os
import duckdb

def norm(v):
    """Map any cell to a (rank, value) pair so rows are total-orderable
    across None/bool/number/str/list mixes."""
    import decimal
    if v is None:
        return (0, 0)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, float):
        if math.isnan(v):
            return (9, 0)
        # absorb last-ulp differences the driver's hash would also absorb
        return (2, round(v, 9))
    if isinstance(v, int):
        return (2, v)
    if isinstance(v, decimal.Decimal):
        return (2, round(float(v), 9))
    if isinstance(v, (list, tuple)):
        return (4, tuple(norm(x) for x in v))
    return (3, str(v))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for qname, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, qname)
        try:
            duck = con.sql(sql)
            duck_cols = [c.lower() for c in duck.columns]
            duck_rows = duck.fetchall()
            spark = con.sql(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            spark_cols = [c.lower() for c in spark.columns]
            spark_rows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {qname}: error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {qname}: cols duck={sorted(duck_cols)} "
                  f"spark={sorted(spark_cols)}")
            n_fail += 1
            continue
        # align column order by name
        dperm = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        sperm = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        dset = sorted(tuple(norm(r[i]) for i in dperm) for r in duck_rows)
        sset = sorted(tuple(norm(r[i]) for i in sperm) for r in spark_rows)
        if len(dset) != len(sset):
            print(f"FAIL {qname}: rows duck={len(dset)} spark={len(sset)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(dset, sset) if a != b]
        if bad:
            print(f"FAIL {qname}: {len(bad)}/{len(dset)} rows differ; "
                  f"first: duck={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
        else:
            # exact-match audit: how many rows match bit-exactly (no round)?
            print(f"PASS {qname} ({len(dset)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
