"""Driver-style correctness self-check: run every __spark_entry__ query on
Spark AND its oracle_sql on DuckDB over the same parquet tables; compare
row count, column-name set, and an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy arrays / lists
        return str(list(v))
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x01".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from mysql_secure_agent_spark.session import get_spark

    spark = get_spark(
        app_name="selfcheck", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK   " if ok else "MISMATCH"
        print(f"{status} {name}: spark {sn} rows / oracle {on} rows ({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"   cols spark={sc} oracle={oc}")
            elif sn == on:
                # show first differing rows
                a = sorted("\x01".join(norm_cell(v) for v in r) for r in sdf[sorted(sdf.columns)].itertuples(index=False))
                b = sorted("\x01".join(norm_cell(v) for v in r) for r in odf[sorted(odf.columns)].itertuples(index=False))
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark : {x[:200]}")
                    print(f"   oracle: {y[:200]}")
    # entry smoke
    if not only:
        n = entrymod.entry(spark).count()
        print(f"entry() smoke: {n} rows")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
