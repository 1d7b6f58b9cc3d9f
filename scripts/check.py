#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev-only tooling;
the shipped library is pure Scala/Spark). Runs each oracle SQL from a
Verify output dir in DuckDB against the same testdata tables, loads the
Spark parquet result, and compares as sorted multisets of rows.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--strict]

Default mode mirrors the historical tolerance (round to 9 dp, Python
``-0.0 == 0.0``). --strict mode exists because the driver hashes RAW
values: it compares floats bit-for-bit (including the sign of zero),
and flags any oracle column whose DuckDB type is engine-fragile
(HUGEINT/DECIMAL — types whose textual/arrow rendering differs across
builds even when the VALUE matches). Round 6/7 taught us both lessons:
q_t9's ``sum(BIGINT)`` → HUGEINT and q_c5's ``round(x,6)`` → -0.0 both
passed the loose local gate while failing the driver's hash. Any
strict-mode failure is a GATE-DESIGN bug (fix the gate representation,
e.g. integer micro-units), not a tolerance to absorb.
"""
import sys, glob, math, json, os, struct
import duckdb

FRAGILE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def norm(v, strict):
    """Map any cell to a (rank, value) pair so rows are total-orderable
    across None/bool/number/str/list mixes."""
    import decimal
    if v is None:
        return (0, 0)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, float):
        if strict:
            # bit-exact via the raw IEEE-754 bits — sign of zero AND
            # NaN sign/payload included (the driver hashes raw bytes,
            # so a NaN-collapsing norm would silently pass local while
            # failing the driver)
            return (2, struct.pack('>d', v))
        if math.isnan(v):
            return (9, 0)
        # absorb last-ulp differences the driver's hash would also absorb
        return (2, round(v, 9))
    if isinstance(v, int):
        # strict floats are (value, signbit) tuples, so an int can never
        # silently equal a float there — exactly the driver's behaviour
        return (2, v)
    if isinstance(v, decimal.Decimal):
        if strict:
            return (8, str(v))  # never compares equal to int/float
        return (2, round(float(v), 9))
    if isinstance(v, (list, tuple)):
        return (4, tuple(norm(x, strict) for x in v))
    return (3, str(v))


def main(sf_dir, out_dir, strict=False):
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
            duck_types = [str(t).upper() for t in duck.types]
            duck_rows = duck.fetchall()
            spark = con.sql(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            spark_cols = [c.lower() for c in spark.columns]
            spark_rows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {qname}: error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if strict:
            fragile = [(c, t) for c, t in zip(duck_cols, duck_types)
                       if any(f in t for f in FRAGILE_TYPES)]
            if fragile:
                print(f"FAIL {qname}: engine-fragile oracle column types "
                      f"{fragile} (gate-design bug: cast to BIGINT/DOUBLE)")
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
        dset = sorted(tuple(norm(r[i], strict) for i in dperm)
                      for r in duck_rows)
        sset = sorted(tuple(norm(r[i], strict) for i in sperm)
                      for r in spark_rows)
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
            print(f"PASS {qname} ({len(dset)} rows)")
            n_pass += 1
    mode = "strict" if strict else "loose"
    print(f"== {n_pass} pass, {n_fail} fail ({mode})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    sys.exit(main(args[0], args[1], strict="--strict" in sys.argv))
