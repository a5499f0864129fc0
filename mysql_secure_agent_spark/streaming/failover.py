"""Primary failover: resume the tail from a promoted replica — SURVEY §2 T3
taken one server further.

The reference's reconnect path resumes the SAME server from its checkpointed
(file, position) (``state/AgentState.java:14-17``; the tail loop re-requests
from ``BinlogPosition``). When the primary is gone and a replica is
promoted, that cursor is useless: the new primary's binlog has different
file names and offsets, and it re-serves a suffix that overlaps what the
table already applied (a replica lags, or rewinds to the last transaction
boundary). MySQL solves this with GTID auto-positioning — the client sends
its ``gtid_executed`` set and the new primary streams exactly what is
missing.

The lake's analog of ``gtid_executed`` is the table itself: every delta
manifest entry carries the exact lsn range its merge stamped
(``LakeTable.merge``), so the highest applied lsn is recoverable from
commit METADATA alone — no data files open, no Spark job, and independent
of the (now unusable) streaming checkpoint. ``resume_from_promotion`` reads
that watermark and starts a fresh stream over the promoted feed with
``min_lsn_exclusive`` set: the overlap is dropped before the salting
shuffle and the decode UDF ever see it. Correctness never depended on the
filter — last-image-wins reconciliation by lsn absorbs replayed images —
it keeps the (potentially hours-long) overlap off the wire.

The streaming checkpoint must be FRESH: the old one binds Spark's file
source to the dead primary's directory listing. Exactly-once across the
switch holds anyway, because it was never checkpoint-based: batch ids are
registered in the table's own commit ledger and images reconcile by lsn.
The fresh checkpoint DOES restart Spark's epoch numbering at 0, so the
promoted stream's batch ids are namespaced by the promoted feed's identity
(``batch_id_prefix``) — otherwise they would collide with the dead
primary's registered ids and silently skip.
"""

from __future__ import annotations

import hashlib
import os

from .pipeline import CdcPipeline
from ..lake.table import LakeTable


def applied_lsn_watermark(table: LakeTable) -> int:
    """Highest source_lsn the table has durably applied, recovered from
    commit metadata only (manifest entries carry batch-exact ``lsn_max``
    stamps; base rewrites carry footer-derived ones). Driver-side walk,
    one manifest in memory at a time; an admin-time operation, not a hot
    path. Returns 0 for an empty table."""
    commit = table.commit_at(resolve=False)
    wm = 0
    for name in commit.manifests:
        for entries in table._load_manifest(name).values():
            for e in entries:
                mx = e.get("lsn_max")
                if mx is not None and int(mx) > wm:
                    wm = int(mx)
    return wm


def resume_from_promotion(
    table: LakeTable,
    promoted_feed_dir: str,
    checkpoint_dir: str,
    **pipeline_kwargs,
) -> CdcPipeline:
    """Build the pipeline that continues ingest from a promoted replica's
    feed: watermark from the table's own ledger (GTID auto-positioning
    analog), overlap filtered before any shuffle, fresh checkpoint
    enforced. Run it with ``.run_stream(spark, checkpoint_dir)`` /
    ``.run_live`` exactly like a first-boot pipeline."""
    marker = os.path.join(checkpoint_dir, "_promoted_from")
    feed_id = os.path.abspath(promoted_feed_dir)
    if os.path.exists(checkpoint_dir) and os.listdir(checkpoint_dir):
        # resuming THIS incarnation after a crash is the normal T1 restart —
        # the ownership marker distinguishes it from the dead primary's
        # checkpoint (whose file-source state binds the wrong directory)
        owner = None
        if os.path.exists(marker):
            with open(marker) as f:
                owner = f.read().strip()
        if owner != feed_id:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir!r} is not fresh and belongs "
                f"to {owner or 'another stream'!r}: the old checkpoint binds "
                "the file source to the dead primary's directory — failover "
                "needs a new one (exactly-once holds through the table's "
                "batch ledger and lsn reconciliation)"
            )
    else:
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write(feed_id)
    wm = applied_lsn_watermark(table)
    # stable across restarts of THIS incarnation (crash/resume still
    # dedupes), distinct from the dead primary's epoch-numbered ids
    prefix = "fo-" + hashlib.sha1(
        os.path.abspath(promoted_feed_dir).encode()
    ).hexdigest()[:8] + "."
    return CdcPipeline(
        table,
        promoted_feed_dir,
        min_lsn_exclusive=wm,
        batch_id_prefix=prefix,
        **pipeline_kwargs,
    )
