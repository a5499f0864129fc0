"""Table integrity checker (fsck) — the operational tool every long-lived
format grows (parquet-tools check / Iceberg's validation / HDFS fsck): a
10^10-row table accumulates millions of files across years of commits, and
"is the metadata still telling the truth about the bytes on disk?" must be
answerable without trusting the write path that produced them.

Two tiers:

* ``verify(table)`` — driver-only structural audit, O(metadata), zero
  Spark jobs: CURRENT resolves, the commit chain parses back to the floor,
  every manifest the head references exists, every live file entry exists
  on disk with the recorded byte size, stats are well-formed (lsn_min ≤
  lsn_max, key_stats bounds ordered, blooms decode to the declared width),
  the batch ledger parses, and bucket ids are within range.
* ``verify(table, spark=..., deep=True)`` — adds distributed evidence:
  per-file parquet footers are opened executor-side and their row counts /
  lsn ranges are checked against the manifest claims, and every small
  file's recorded key bloom is replayed against the file's actual keys
  (a bloom false NEGATIVE would silently break point lookups — the one
  failure mode the read path cannot detect itself).

Returns ``{"ok": bool, "errors": [...], "checked": {...}}`` — errors are
strings naming the artifact, never exceptions: fsck's job is to complete
the sweep and report everything wrong at once.
"""

from __future__ import annotations

import base64
import json
import os
import zlib
from typing import Any

from .table import LakeTable


def _check_entry(root: str, b: str, e: dict[str, Any], n_buckets: int,
                 errors: list[str]) -> None:
    p = e.get("path")
    if not p:
        errors.append(f"bucket {b}: entry without path: {e}")
        return
    ap = os.path.join(root, p)
    if not os.path.exists(ap):
        errors.append(f"{p}: missing on disk")
        return
    size = os.path.getsize(ap)
    if "bytes" in e and e["bytes"] != size:
        errors.append(f"{p}: size {size} != recorded {e['bytes']}")
    if not 0 <= int(b) < n_buckets:
        errors.append(f"{p}: bucket {b} out of range [0, {n_buckets})")
    if e.get("kind") not in ("base", "delta"):
        errors.append(f"{p}: unknown kind {e.get('kind')!r}")
    lm, lx = e.get("lsn_min"), e.get("lsn_max")
    if lm is not None and lx is not None and lm > lx:
        errors.append(f"{p}: lsn_min {lm} > lsn_max {lx}")
    ks = e.get("key_stats")
    if ks is not None:
        for c, bounds in ks.items():
            if not isinstance(bounds, list) or len(bounds) != 2:
                errors.append(f"{p}: malformed key_stats[{c}]")
            else:
                try:
                    if bounds[0] > bounds[1]:
                        errors.append(f"{p}: key_stats[{c}] min > max")
                except TypeError:
                    errors.append(f"{p}: key_stats[{c}] mixed types")
    kb = e.get("key_bloom")
    if kb is not None:
        try:
            bits = zlib.decompress(base64.b64decode(kb["z"]))
            if len(bits) * 8 != int(kb["m"]) or not 1 <= int(kb["k"]) <= 16:
                errors.append(f"{p}: bloom geometry mismatch")
        except Exception as ex:  # noqa: BLE001 — report, don't raise
            errors.append(f"{p}: bloom undecodable ({type(ex).__name__})")


def verify(
    table: LakeTable, spark=None, deep: bool = False
) -> dict[str, Any]:
    errors: list[str] = []
    checked: dict[str, Any] = {}

    # --- commit chain -----------------------------------------------------
    try:
        head = table.commit_at()
    except Exception as ex:  # noqa: BLE001
        return {"ok": False, "errors": [f"CURRENT unreadable: {ex}"], "checked": {}}
    floor = table.version_floor()
    chain = 0
    for v in range(floor, head.version + 1):
        try:
            table.commit_at(v, resolve=False)
            chain += 1
        except Exception as ex:  # noqa: BLE001
            errors.append(f"commit v{v} unreadable: {type(ex).__name__}: {ex}")
    checked["commits"] = chain

    for name in head.manifests:
        if not os.path.exists(table._manifest_path(name)):
            errors.append(f"manifest {name}: referenced by head, missing on disk")

    # --- ledger -----------------------------------------------------------
    bad_ledger = [
        bid for bid, v in head.applied_batches.items()
        if not isinstance(v, int) or v < 0 or v > head.version
    ]
    for bid in bad_ledger:
        errors.append(f"ledger batch {bid!r}: version outside [0, head]")
    checked["ledger_entries"] = len(head.applied_batches)

    # --- live files -------------------------------------------------------
    n_files = 0
    for b, entries in head.files.items():
        for e in entries:
            n_files += 1
            _check_entry(table.root, b, e, head.n_buckets, errors)
    checked["files"] = n_files

    if deep:
        if spark is None:
            raise ValueError("deep=True needs a SparkSession")
        errors += _deep_check(table, spark, head)
        checked["deep"] = True

    return {"ok": not errors, "errors": errors, "checked": checked}


def _deep_check(table: LakeTable, spark, head) -> list[str]:
    """Executor-side: footers vs manifest claims, blooms vs actual keys.
    One task per file over the (path, claims) listing — O(files) metadata
    reads distributed across the cluster, no data-page scans except the
    key columns of bloom-carrying (≤ cap) files."""
    import pandas as pd

    claims = []
    for b, entries in head.files.items():
        for e in entries:
            # sentinels, not None/NaN: pandas→Spark inference chokes on
            # all-null columns and NaN defeats `is not None` checks
            claims.append(
                {
                    "path": os.path.join(table.root, e["path"]),
                    "lsn_min": int(e.get("lsn_min", -1) if e.get("lsn_min") is not None else -1),
                    "lsn_max": int(e.get("lsn_max", -1) if e.get("lsn_max") is not None else -1),
                    "bloom": json.dumps(e["key_bloom"]) if e.get("key_bloom") else "",
                }
            )
    if not claims:
        return []
    types = dict(head.schema)
    bucket_cols = list(head.bucket_cols)
    ddl_types = [types[c] for c in bucket_cols]

    def audit(batches):
        import pyarrow.parquet as pq

        from .bloom import bloom_contains, key_hash
        from .table import SYS_LSN

        for pdf in batches:
            errs = []
            for rec in pdf.to_dict("records"):
                p = rec["path"]
                try:
                    pf = pq.ParquetFile(p)
                except Exception as ex:  # noqa: BLE001
                    errs.append(f"{p}: footer unreadable ({type(ex).__name__})")
                    continue
                names = pf.schema_arrow.names
                if rec["lsn_min"] >= 0 and SYS_LSN in names:
                    t = pf.read(columns=[SYS_LSN])
                    col = t.column(SYS_LSN).to_pylist()
                    if col:
                        lo, hi = min(col), max(col)
                        if lo < rec["lsn_min"] or hi > rec["lsn_max"]:
                            errs.append(
                                f"{p}: footer lsn [{lo},{hi}] outside "
                                f"manifest [{rec['lsn_min']},{rec['lsn_max']}]"
                            )
                if rec["bloom"]:
                    bloom = json.loads(rec["bloom"])
                    t = pf.read(columns=bucket_cols)
                    tuples = zip(*(t.column(c).to_pylist() for c in bucket_cols))
                    for tup in tuples:
                        if not bloom_contains(bloom, key_hash(list(tup), ddl_types)):
                            errs.append(
                                f"{p}: bloom FALSE NEGATIVE for key {tup!r} — "
                                "point lookups would silently miss this file"
                            )
                            break
            yield pd.DataFrame({"err": errs})

    pdf = pd.DataFrame(claims)
    out = (
        spark.createDataFrame(pdf)
        .repartition(min(len(claims), 64))
        .mapInPandas(audit, "err string")
        .collect()
    )
    return [r.err for r in out]


if __name__ == "__main__":  # python -m mysql_secure_agent_spark.lake.fsck <root> [--deep]
    import sys

    root = sys.argv[1]
    deep = "--deep" in sys.argv[2:]
    spark = None
    if deep:
        from ..session import get_spark

        spark = get_spark()
    report = verify(LakeTable(root), spark=spark, deep=deep)
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["ok"] else 1)
