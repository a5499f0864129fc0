"""Sequential replay oracle — the reference's semantics as executable truth.

Replays a changelog exactly the way the reference's single-threaded loop does
(``Updater.java:148-186``): strictly in log (``source_lsn``) order, one event
at a time, keyed by the primary key (conv_id, turn_idx):

  * INSERT / UPDATE → the row image becomes the state for its key (upsert;
    UPDATE is delete(old)+upsert(new) in the reference, ``Updater.java:198-207``,
    which on a fixed key is equivalent to replacement).
  * DELETE → the key is removed (delete images arrive in the newRows slot,
    ``BinlogClient.java:285-291``).
  * DDL ADD_COLUMN at lsn L → rows applied before L have NULL for the column.
  * DDL DROP_COLUMN at lsn L → the column leaves the schema; stored values
    are purged (so a later re-ADD reads NULL, never resurrected data —
    matching ``LakeTable.drop_column``'s dropped_cols purge guard). Columns
    not active at end of log are absent from the output frame.
  * DDL RENAME_COLUMN at lsn L → the column keeps its values under the new
    name; later row events still deliver the value under the old *physical*
    feed column (a binlog row image carries positions, not names — the
    static-schema feed is the decoder's pre-rename tableDefinition),
    matching ``LakeTable.merge``'s rename-lag relabeling.

Pure pandas, ~O(n) dict replay. Ground truth for every snapshot-diff test.
"""

from __future__ import annotations

import pandas as pd

BASE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def replay(
    changelog: pd.DataFrame,
    ddl: pd.DataFrame | None = None,
    base_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Apply the changelog sequentially; return the final table state sorted
    by (conv_id, turn_idx) — the stable turn ordering of the correctness
    invariant (per-turn text equality)."""
    cols = list(base_columns or BASE_COLUMNS)
    ddl = ddl if ddl is not None else pd.DataFrame(columns=["source_lsn", "action", "column_name", "column_type"])
    ddl_sorted = ddl.sort_values("source_lsn").to_dict("records")

    # columns present from the start (before any ADD_COLUMN events)
    added = {d["column_name"] for d in ddl_sorted if d["action"] == "ADD_COLUMN"}
    active = [c for c in cols if c not in added]
    # logical column -> physical feed column (diverges on RENAME: the feed
    # keeps delivering the value under the old name)
    src = {c: c for c in cols}

    log = changelog.sort_values("source_lsn")
    state: dict[tuple, dict] = {}

    def apply_ddl(d: dict) -> None:
        name = d["column_name"]
        if d["action"] == "ADD_COLUMN" and name not in active:
            active.append(name)
        elif d["action"] == "DROP_COLUMN" and name in active:
            active.remove(name)
            for row in state.values():  # purge: a re-ADD must read NULL
                row[name] = None
        elif d["action"] == "RENAME_COLUMN" and name in active:
            new = d.get("new_name")
            if not isinstance(new, str) or new in active:
                return
            active[active.index(name)] = new
            cols[cols.index(name)] = new
            src[new] = src.pop(name, name)
            for row in state.values():
                row[new] = row.pop(name, None)

    ddl_i = 0
    for rec in log.to_dict("records"):
        lsn = rec["source_lsn"]
        while ddl_i < len(ddl_sorted) and ddl_sorted[ddl_i]["source_lsn"] <= lsn:
            apply_ddl(ddl_sorted[ddl_i])
            ddl_i += 1
        key = (rec["conv_id"], rec["turn_idx"])
        if rec["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = {
                c: rec.get(src.get(c, c)) if c in active else None for c in cols
            }
    while ddl_i < len(ddl_sorted):  # DDL after the last row event
        apply_ddl(ddl_sorted[ddl_i])
        ddl_i += 1
    out_cols = [c for c in cols if c in active]
    out = pd.DataFrame(
        [{c: r[c] for c in out_cols} for r in state.values()], columns=out_cols
    )
    if out.empty:
        return out
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
