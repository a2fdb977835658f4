#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet dir, compare row count + column names + order-insensitive
normalized values.

HARDENING (round-4, after the q76 driver red): the oracle result is
fetched as an Arrow table and any DECIMAL-typed output column is a
HARD FAILURE — DuckDB silently promotes sum(BIGINT) to HUGEINT
(int128 → arrow decimal128) and round(DECIMAL) stays DECIMAL, both of
which str()-compare equal locally but break the driver's typed
value-hash. This is exactly how q76 (r3) and q01/q02/q24 (r1) passed
the old twin yet failed the driver. Canonical-type drift between the
Spark and oracle schemas (e.g. int32 vs int64) is reported as WARN.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def table_of(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out


def canon_type(t: str) -> str:
    """Collapse a Spark dtype string or an Arrow type string to a
    canonical class so int32-vs-int64 / float-vs-double drift between
    engine and oracle is visible (WARN-level)."""
    t = str(t).lower()
    for pat, c in (
        ("decimal", "DECIMAL"),
        ("int8", "int"),
        ("int16", "int"),
        ("int32", "int"),
        ("int64", "bigint"),
        ("tinyint", "int"),
        ("smallint", "int"),
        ("bigint", "bigint"),
        ("int", "int"),
        ("halffloat", "float"),
        ("float64", "double"),
        ("double", "double"),
        ("float", "float"),
        ("large_string", "string"),
        ("string", "string"),
        ("varchar", "string"),
        ("bool", "bool"),
        ("timestamp", "timestamp"),
        ("date", "date"),
        ("large_binary", "binary"),
        ("binary", "binary"),
        ("large_list", "list"),
        ("list", "list"),
        ("array", "list"),
        ("struct", "struct"),
    ):
        if t.startswith(pat):
            return c
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from web_scraper_spark.plans.queries import ORACLES, QUERIES
    from web_scraper_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(cores=8)
    failures = []
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in ORACLES:
            print(f"{name}: rows-only — {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append(name)
                print(f"{name}: FAIL empty result")
            continue
        try:
            tbl = con.execute(ORACLES[name]).fetch_arrow_table()
            ocols = list(tbl.schema.names)
            cols_data = [c.to_pylist() for c in tbl.columns]
            orows = list(zip(*cols_data)) if tbl.num_rows else []
        except Exception as e:
            failures.append(name)
            print(f"{name}: ORACLE ERROR {str(e)[:300]}")
            continue
        # Hard gate: DuckDB HUGEINT/DECIMAL outputs (uncast sum(),
        # round() of DECIMAL, quantile over DECIMAL) str()-compare
        # equal here but fail the driver's typed value-hash.
        bad = [f"{f.name}:{f.type}" for f in tbl.schema if "decimal" in str(f.type)]
        if bad:
            failures.append(name)
            print(
                f"{name}: NON-PORTABLE ORACLE TYPE {bad} — wrap in "
                "CAST(... AS BIGINT/DOUBLE) per CLAUDE.md portability rules"
            )
            continue
        stypes = {n: canon_type(t) for n, t in sdf.dtypes}
        otypes = {f.name: canon_type(f.type) for f in tbl.schema}
        drift = {
            c: (stypes[c], otypes[c])
            for c in stypes
            if c in otypes and stypes[c] != otypes[c]
        }
        if drift:
            print(f"{name}: WARN canonical-type drift spark-vs-oracle: {drift}")
        sc, st = table_of(srows, scols)
        oc, ot = table_of(orows, ocols)
        if sc != oc:
            failures.append(name)
            print(f"{name}: COLUMN MISMATCH spark={sc} oracle={oc}")
            continue
        if len(st) != len(ot):
            failures.append(name)
            print(f"{name}: ROWCOUNT MISMATCH spark={len(st)} oracle={len(ot)}")
            continue
        if st != ot:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(st, ot) if a != b)
            print(f"{name}: VALUE MISMATCH {ndiff}/{len(st)} rows differ; first:")
            for a, b in zip(st, ot):
                if a != b:
                    print("  spark :", a)
                    print("  oracle:", b)
                    break
            continue
        print(f"{name}: OK ({len(st)} rows)")

    spark.stop()
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
