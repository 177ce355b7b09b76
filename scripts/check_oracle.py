"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, schema
(column names) and order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import hashlib
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session  # noqa: E402


def value_hash(rows, columns):
    ordered_cols = sorted(columns)
    lines = []
    for row in rows:
        d = dict(zip(columns, row)) if not isinstance(row, dict) else row
        lines.append("|".join(_norm(d[c]) for c in ordered_cols))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return "%.6f" % v
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for name in entry_mod.TABLES:
        con.sql(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'" % (name, sf_dir, name)
        )
    # demo_queries: rows-only demos kept out of the driver's 50-entry gate
    # dict (each has an oracle-bearing twin inside it) — still run here so
    # the full surface stays visible every round
    queries = {**entry_mod.queries(), **entry_mod.demo_queries()}
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as exc:
            print("%-28s SPARK ERROR: %s" % (name, str(exc)[:200]))
            failures.append(name)
            continue
        elapsed = time.time() - t0
        sql = oracles.get(name)
        if not sql:
            print("%-28s rows-only: %d rows (%.1fs)" % (name, len(spark_rows), elapsed))
            continue
        try:
            rel = con.sql(sql)
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as exc:
            print("%-28s DUCKDB ERROR: %s" % (name, str(exc)[:200]))
            failures.append(name)
            continue
        spark_cols_l = [c.lower() for c in spark_cols]
        ok_schema = sorted(spark_cols_l) == sorted(duck_cols)
        ok_rows = len(spark_rows) == len(duck_rows)
        h_spark = value_hash(spark_rows, spark_cols_l)
        h_duck = value_hash(duck_rows, duck_cols)
        ok_hash = h_spark == h_duck
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "MISMATCH"
        print(
            "%-28s %s rows=%d/%d schema=%s hash=%s (%.1fs)"
            % (name, status, len(spark_rows), len(duck_rows), ok_schema, ok_hash, elapsed)
        )
        if status != "OK":
            failures.append(name)
            if not ok_hash and ok_rows and ok_schema:
                sd = {tuple(_norm(v) for v in r) for r in spark_rows}
                dd = {tuple(_norm(v) for v in r) for r in duck_rows}
                # align column order: sort columns both sides
                print("  spark-only sample:", list(sd - dd)[:2])
                print("  duck-only sample:", list(dd - sd)[:2])
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
