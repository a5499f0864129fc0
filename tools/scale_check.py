"""Scale-level correctness cross-check: two independent merge plans, one hash.

The pandas oracle proves correctness at fixture scale; it cannot replay a
10^8-event feed. This check closes that gap with plan diversity instead of
a reference implementation: the SAME feed is applied through two materially
different physical strategies —

  * ``window``        — one exchange, row_number window dedup;
  * ``max_by_partial``— map-side partial max_by aggregate, two exchanges;

and the final table states are reduced to an order-insensitive content hash
(xor of per-row hashes — commutative, so no global sort is needed). The
plans share no dedup code path beyond the DataFrame API, so identical
hashes at the bench scale is strong evidence the merge semantics (not just
the small-scale fixtures) are right. Also prints per-run row counts and
wall times.

Usage: python tools/scale_check.py [feed_dir] [n_events_if_generating]
Defaults to the bench feed location; generates 6.4M events if absent.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def content_hash(df) -> tuple[int, str]:
    """(row_count, hex hash) — xor + sum of per-row xxhash64 over all columns
    rendered to string (null-safe). Order-insensitive, no driver collect."""
    from pyspark.sql import functions as F

    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    h = F.xxhash64(*cols)
    # xor is order-insensitive and overflow-free; the mod-sum adds
    # multiplicity sensitivity (xor alone cancels even duplicates) and stays
    # far under long range at 10^8 rows
    row = (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.pmod(F.col("h"), F.lit(1_000_000_007))).alias("m"),
        )
        .first()
    )
    return int(row["n"]), f"{(row['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}:{row['m']}"


def main() -> None:
    import pyspark.sql  # noqa: F401  (import before session env tweaks)

    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.session import get_spark
    from mysql_secure_agent_spark.sources.changelog_spark import write_feed_spark
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    feed = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/cdc_bench_sf0.1/feed"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 6_400_000
    work = "/dev/shm/scale_check"
    os.makedirs(work, exist_ok=True)

    spark = get_spark(app_name="scale_check", cores=16, shuffle_partitions=32)
    if not os.path.exists(os.path.join(feed, "data", "_SUCCESS")):
        feed = os.path.join(work, "feed")
        if not os.path.exists(os.path.join(feed, "data", "_SUCCESS")):
            write_feed_spark(
                spark, feed, n_events=n_events,
                # files sized ~10M events so a 640M-event rehearsal still
                # streams in bounded micro-batches at mfpt=64
                n_convs=max(200, n_events // 50),
                n_files=max(16, n_events // 10_000_000),
                zipf_s=1.2, seed=42, strict_ops=False,
            )

    out: dict[str, dict] = {}
    for strategy in ["window", "max_by_partial"]:
        tbl_dir = os.path.join(work, f"tbl_{strategy}")
        ck_dir = os.path.join(work, f"ck_{strategy}")
        shutil.rmtree(tbl_dir, ignore_errors=True)
        shutil.rmtree(ck_dir, ignore_errors=True)
        table = LakeTable.create(
            tbl_dir, TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=64, overwrite=True
        )
        pipe = CdcPipeline(table, feed, normalize=True, dedup_strategy=strategy)
        t0 = time.time()
        pipe.run_stream(spark, ck_dir, max_files_per_trigger=64)
        wall = time.time() - t0
        n, h = content_hash(table.read(spark))
        head = table.commit_at(resolve=False)
        commit_path = os.path.join(
            tbl_dir, "_commits", f"v{head.version:08d}.json"
        )
        out[strategy] = {
            "rows": n,
            "hash": h,
            "wall_s": round(wall, 2),
            "commit_json_bytes": os.path.getsize(commit_path),
            "n_manifests": len(head.manifests),
        }
        shutil.rmtree(tbl_dir, ignore_errors=True)
        shutil.rmtree(ck_dir, ignore_errors=True)

    match = (
        out["window"]["rows"] == out["max_by_partial"]["rows"]
        and out["window"]["hash"] == out["max_by_partial"]["hash"]
    )

    # Driver-memory + commit-metadata footprint: the merge path must stay
    # O(batch) in driver memory and O(MAX_MANIFESTS) in commit size no
    # matter the event count — compare these numbers across 64M/640M runs.
    import resource

    py_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    try:
        jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        with open(f"/proc/{jvm_pid}/status") as f:
            jvm_hwm_mb = next(
                int(line.split()[1]) // 1024
                for line in f
                if line.startswith("VmHWM")
            )
    except Exception:
        jvm_hwm_mb = None
    print(
        json.dumps(
            {
                "feed": feed,
                "strategies": out,
                "state_match": match,
                "driver_python_peak_rss_mb": py_rss_mb,
                "driver_jvm_peak_rss_mb": jvm_hwm_mb,
            }
        )
    )
    spark.stop()
    sys.exit(0 if match else 1)


if __name__ == "__main__":
    main()
