"""Local replica of the driver's correctness gate.

Runs each entry in ``__spark_entry__.queries()`` on Spark AND the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, schema (column names sorted), and a value hash computed over
rows sorted by all columns.  Usage:

    python tools/oracle_check.py [query ...]        # default: all
    SF_DIR=/root/testdata/sf0.01 python tools/oracle_check.py ann_lsh_bucket
"""
from __future__ import annotations

import hashlib
import json
import math
import os
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return json.dumps({k: _norm(x) for k, x in sorted(v.items())})
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("oracle_check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"{name}: spark_rows={len(rows)} (no_oracle)")
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rc = len(rows) == len(orows)
            sc = sorted(cols) == sorted(ocols)
            hc = sc and _hash_rows(cols, rows) == _hash_rows(ocols, orows)
            status = "OK" if (rc and sc and hc) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(rows)}/{len(orows)} "
                f"schema={'ok' if sc else f'{sorted(cols)} vs {sorted(ocols)}'} hash={'ok' if hc else 'MISMATCH'}"
            )
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
