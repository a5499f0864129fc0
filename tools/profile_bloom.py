"""A/B the r4 manifest-stats write cost on the merge-path bench queries
(VERDICT r4 item 3: cdc_merge_into_lake 2.1x, cdc_jsonl_roundtrip 1.6x,
cdc_decode_types 1.7x vs r3 — is it the per-delta key blooms/key stats,
or host weather?).

Runs each query N times under three write-path configurations at the
bench sf — stock, blooms disabled, blooms+key-stats disabled — by
monkeypatching the two stat builders (driver-side, sequential per written
file). Prints per-config best/median walls.

Usage: python tools/profile_bloom.py [sf_dir] [reps]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["cdc_merge_into_lake", "cdc_jsonl_roundtrip", "cdc_decode_types"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from mysql_secure_agent_spark.lake import table as tablemod
    from mysql_secure_agent_spark.session import get_spark

    spark = get_spark(
        app_name="profile-bloom",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()

    real_bloom = tablemod._file_key_bloom
    real_stats = tablemod._file_key_stats

    def noop(*a, **k):
        return None

    configs = {
        "stock": (real_bloom, real_stats),
        "no_bloom": (noop, real_stats),
        "no_bloom_no_keystats": (noop, noop),
    }

    # warm the session once (worker pool, codegen)
    qs[QUERIES[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {}
    for r in range(reps):
        for cfg, (fb, fs) in configs.items():
            tablemod._file_key_bloom = fb
            tablemod._file_key_stats = fs
            for name in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results.setdefault(name, {}).setdefault(cfg, []).append(
                    time.time() - t0
                )
    tablemod._file_key_bloom = real_bloom
    tablemod._file_key_stats = real_stats

    for name, by_cfg in results.items():
        print(f"\n{name}:")
        for cfg, walls in by_cfg.items():
            print(
                f"  {cfg:24s} best={min(walls):6.3f}s "
                f"median={statistics.median(walls):6.3f}s  {sorted(round(w,2) for w in walls)}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
