"""Deterministic binlog-shaped change-feed generator for transcripts.

Plays the role of the reference's live-capture test harness
(``binlog_test_generator/CaptureBinlogEvents.java:24-44``): it synthesizes the
stream the engine ingests — insert/update/delete row images in strict log
order with monotone ``source_lsn``, file-rotation epochs (ROTATE analog,
``BinlogClient.java:254-259``), hot-conversation Zipf skew, and optional
mid-stream DDL (ADD COLUMN ``tool``) for the schema-evolution gate.

Event-sequence validity mirrors a real row-based binlog: the first image of a
key is an INSERT, a DELETE is never followed by another DELETE of the same key
(the next image is a re-INSERT), and UPDATE carries the full new row image
(``source/SourceEvent.java:8-29``; UPDATE old/new pairing per
``Updater.java:198-207`` — PK-changing updates would arrive as D+I, which this
generator models by construction since every image is keyed).

Fully vectorized (numpy/pandas); seed-fixed ⇒ byte-stable output.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "calculator", "python", "browser", "none"])


@dataclass
class FeedSpec:
    n_events: int = 100_000
    n_convs: int = 2_000
    max_turns: int = 64
    zipf_s: float = 1.2          # hot-conversation skew
    delete_frac: float = 0.08    # fraction of non-first images that are deletes
    rotate_every: int = 50_000   # binlog file rotation period (events)
    seed: int = 42
    ddl_add_tool_at_frac: float | None = None  # e.g. 0.4 → ADD COLUMN tool at 40%
    # e.g. 0.6 → MODIFY COLUMN turn_idx int→bigint at 60% (type widening;
    # values unchanged, the engine rewrites existing data with a cast)
    ddl_modify_turn_to_long_at_frac: float | None = None
    # e.g. 0.5 → RENAME COLUMN tool→tool_name at 50%. The FEED keeps
    # delivering the value under the old ``tool`` column after the rename —
    # a binlog row image carries positions, not names, so a decoder holding
    # the pre-rename tableDefinition keeps the old label (the engine's
    # rename-lag relabeling maps it; the reference would silently mislabel,
    # Updater.java:188-217 only notices column-COUNT changes).
    ddl_rename_tool_at_frac: float | None = None
    base_ts: str = "2026-01-01"
    # conv_id namespace prefix — sharded (multi-source) fixtures give each
    # shard its own prefix so key spaces are disjoint, like a sharded fleet
    conv_prefix: str = "c"


def generate_changelog(spec: FeedSpec) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (changelog_df, ddl_df) as pandas frames in lsn order.

    changelog columns: op, conv_id, turn_idx, role, text, tool, ts,
    source_lsn, binlog_file, binlog_pos.
    ddl columns: source_lsn, action, column_name, column_type.
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- key choice: Zipf over conversations, uniform turn within conv ------
    ranks = np.arange(1, spec.n_convs + 1, dtype=np.float64)
    probs = ranks ** (-spec.zipf_s)
    probs /= probs.sum()
    conv = rng.choice(spec.n_convs, size=n, p=probs)
    # per-conv turn budget between 4 and max_turns (deterministic per conv)
    conv_rng = np.random.default_rng(spec.seed + 1)
    turn_budget = conv_rng.integers(4, spec.max_turns + 1, size=spec.n_convs)
    turn = (rng.integers(0, 1 << 30, size=n) % turn_budget[conv]).astype(np.int32)

    lsn = np.arange(1, n + 1, dtype=np.int64)

    # --- op assignment: per-key order-aware, vectorized ---------------------
    # first image of a key → I; after a D → I (re-insert); else U or D.
    key = conv.astype(np.int64) * (spec.max_turns + 1) + turn
    order = np.lexsort((lsn, key))  # group by key, lsn ascending within
    k_sorted = key[order]
    first_in_group = np.ones(n, dtype=bool)
    first_in_group[1:] = k_sorted[1:] != k_sorted[:-1]

    want_delete = rng.random(n) < spec.delete_frac
    op_sorted = np.full(n, "U", dtype="<U1")
    wd_sorted = want_delete[order]
    op_sorted[wd_sorted] = "D"
    op_sorted[first_in_group] = "I"
    # no D immediately after D; and the image after any D is a re-insert
    prev_d = np.zeros(n, dtype=bool)
    prev_d[1:] = (op_sorted[:-1] == "D") & ~first_in_group[1:]
    # iterate to fixpoint: flipping D→I can expose a new prev-D chain
    while prev_d.any():
        op_sorted[prev_d & (op_sorted == "D")] = "I"
        op_sorted[prev_d & (op_sorted == "U")] = "I"
        new_prev = np.zeros(n, dtype=bool)
        new_prev[1:] = (op_sorted[:-1] == "D") & ~first_in_group[1:]
        if (new_prev == prev_d).all():
            break
        prev_d = new_prev
    op = np.empty(n, dtype="<U1")
    op[order] = op_sorted

    # --- payload -------------------------------------------------------------
    conv_id = np.char.add(spec.conv_prefix, np.char.zfill(conv.astype("<U8"), 8))
    role = ROLES[(turn % 4 + (conv % 2)) % 4]
    tool_idx = rng.integers(0, len(TOOLS), size=n)
    tool = TOOLS[tool_idx].astype(object)
    tool[tool == "none"] = None
    # text unique per revision → proves last-image-wins
    text = pd.Series(conv_id).str.cat(
        [
            pd.Series(turn).astype(str),
            pd.Series(lsn).astype(str),
        ],
        sep=":",
    )
    text = "turn " + text
    ts = pd.Timestamp(spec.base_ts) + pd.to_timedelta(lsn, unit="s")

    binlog_file_no = lsn // spec.rotate_every + 1
    binlog_file = pd.Series(binlog_file_no).map(lambda i: f"mysql-bin.{i:06d}")
    binlog_pos = (lsn % spec.rotate_every) + 4

    df = pd.DataFrame(
        {
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "source_lsn": lsn,
            "binlog_file": binlog_file,
            "binlog_pos": binlog_pos,
        }
    )
    # deletes carry no payload (delete rows arrive with key only; the
    # reference passes delete images in the newRows slot, BinlogClient.java:285-291)
    d_mask = df["op"] == "D"
    for c in ("role", "text", "tool"):
        df.loc[d_mask, c] = None
    df.loc[d_mask, "ts"] = pd.NaT

    # --- DDL stream ----------------------------------------------------------
    ddl_rows = []
    if spec.ddl_add_tool_at_frac is not None:
        ddl_lsn = int(n * spec.ddl_add_tool_at_frac)
        ddl_rows.append(
            {
                "source_lsn": ddl_lsn,
                "action": "ADD_COLUMN",
                "column_name": "tool",
                "column_type": "string",
            }
        )
        # before the DDL the column does not exist in the stream
        df.loc[df["source_lsn"] <= ddl_lsn, "tool"] = None
    if spec.ddl_modify_turn_to_long_at_frac is not None:
        ddl_rows.append(
            {
                "source_lsn": int(n * spec.ddl_modify_turn_to_long_at_frac),
                "action": "MODIFY_COLUMN",
                "column_name": "turn_idx",
                "column_type": "bigint",
            }
        )
    if spec.ddl_rename_tool_at_frac is not None:
        ddl_rows.append(
            {
                "source_lsn": int(n * spec.ddl_rename_tool_at_frac),
                "action": "RENAME_COLUMN",
                "column_name": "tool",
                "column_type": "string",
                "new_name": "tool_name",
            }
        )
        # NOTE: the feed frame keeps the value under ``tool`` for the whole
        # log — rename-lag by design (see ddl_rename_tool_at_frac).
    cols = ["source_lsn", "action", "column_name", "column_type"]
    if any("new_name" in r for r in ddl_rows):
        cols.append("new_name")
    ddl = pd.DataFrame(ddl_rows, columns=cols)
    return df, ddl


def write_feed(
    spec: FeedSpec,
    feed_dir: str,
    n_files: int = 10,
    overwrite: bool = False,
    raw: bool = False,
) -> dict:
    """Write the changelog as ``n_files`` Parquet chunk files in lsn order
    (micro-batch boundaries for the file streaming source) plus a
    ``ddl/ddl.parquet`` sidecar. Returns a manifest dict.

    ``raw=True`` writes binlog-wire-shaped rows instead: the payload columns
    are packed into the binary row-image format of ``functions/decode.py``
    (RowParser analog) so the pipeline's Arrow-vectorized decode path (S9)
    can be exercised end-to-end."""
    import shutil

    if os.path.exists(feed_dir):
        if not overwrite:
            raise FileExistsError(feed_dir)
        shutil.rmtree(feed_dir)
    data_dir = os.path.join(feed_dir, "data")
    os.makedirs(data_dir)
    os.makedirs(os.path.join(feed_dir, "ddl"))

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Explicit Arrow schema: an all-null chunk (e.g. `tool` before its DDL)
    # must still carry the declared type, not arrow's null type.
    arrow_schema = pa.schema(
        [
            ("op", pa.string()),
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("source_lsn", pa.int64()),
            ("binlog_file", pa.string()),
            ("binlog_pos", pa.int64()),
        ]
    )
    df, ddl = generate_changelog(spec)
    if raw:
        from ..functions.decode import encode_frame

        payload = encode_frame(df)
        df = pd.DataFrame(
            {
                "op": df["op"],
                "payload": payload,
                "source_lsn": df["source_lsn"],
                "binlog_file": df["binlog_file"],
                "binlog_pos": df["binlog_pos"],
            }
        )
        arrow_schema = pa.schema(
            [
                ("op", pa.string()),
                ("payload", pa.binary()),
                ("source_lsn", pa.int64()),
                ("binlog_file", pa.string()),
                ("binlog_pos", pa.int64()),
            ]
        )
    chunks = np.array_split(np.arange(len(df)), n_files)
    files = []
    for i, idx in enumerate(chunks):
        path = os.path.join(data_dir, f"feed-{i:05d}.parquet")
        table = pa.Table.from_pandas(
            df.iloc[idx], schema=arrow_schema, preserve_index=False
        )
        pq.write_table(table, path)
        files.append(path)
    ddl_path = os.path.join(feed_dir, "ddl", "ddl.parquet")
    ddl.to_parquet(ddl_path, index=False)
    return {
        "n_events": len(df),
        "n_files": n_files,
        "files": files,
        "ddl_path": ddl_path,
        "ops": df["op"].value_counts().to_dict(),
    }
