"""JSON diff application — the read side of MySQL 8.0's partial JSON
updates (binlog_row_value_options=PARTIAL_JSON, WL#2955).

When an UPDATE touches only part of a JSON document, MySQL logs a
``PARTIAL_UPDATE_ROWS_EVENT`` whose after-image stores, for the JSON
column, a vector of *diffs* instead of the full document
(sql/json_diff.cc ``Json_diff_vector``): each diff is an operation
(REPLACE / INSERT / REMOVE), a JSON path, and (except REMOVE) a value in
the standard binary-JSON encoding. At 100 TB this is the difference
between shipping a 1 MB document per comment-append and shipping ~40
bytes — but the consumer must be able to APPLY the diffs. The reference
predates the event type entirely (EventType.java has no 0x27 route, so
it lands in the discard branch, BinlogClient.java:191-195) — decoding it
exceeds the reference.

Paths in diffs are the restricted form MySQL itself emits (no wildcards,
no ranges, no ``**``): ``$``, ``.member`` / ``."quoted member"``, and
``[N]`` legs only (sql/json_path.cc, only_needs_one=true paths).

Apply semantics follow sql/json_diff.cc ``apply_json_diff``:

* REPLACE — the path must resolve; its value is replaced.
* INSERT — the path's PARENT must resolve and the last leg must NOT
  resolve: a new object member, or an array insert at that index
  (elements shift right; an index past the end appends, matching
  ``Json_array::insert_alias``).
* REMOVE — the path must resolve; the member/element is removed.

A diff that doesn't apply raises ``JsonPatchError`` — MySQL falls back
to writing the full document when a diff cannot apply, so a failing
apply on the consumer side means the stream is corrupt or misordered;
silently skipping would fork the replica. Pure Python over already
decoded documents: diff application is per-changed-row work that rides
inside the existing Arrow-batched decode, never a per-row UDF of its
own.
"""

from __future__ import annotations

import json
import re

import pandas as pd

__all__ = [
    "JsonPatchError",
    "DIFF_REPLACE",
    "DIFF_INSERT",
    "DIFF_REMOVE",
    "parse_json_path",
    "apply_json_diffs",
    "apply_serialized_patches",
    "apply_patches_udf",
]

# operation codes as stored on the wire (enum_json_diff_operation,
# sql/json_diff.h — REPLACE=0, INSERT=1, REMOVE=2)
DIFF_REPLACE = 0
DIFF_INSERT = 1
DIFF_REMOVE = 2


class JsonPatchError(ValueError):
    """A diff did not apply cleanly to the document."""


_MEMBER = re.compile(r'\.(?:"((?:[^"\\]|\\.)*)"|([A-Za-z_$][A-Za-z0-9_$]*))')
_INDEX = re.compile(r"\[(\d+)\]")


def parse_json_path(path: str) -> list[str | int]:
    """``$.a."b c"[3].d`` → ``['a', 'b c', 3, 'd']``. Only the restricted
    grammar diffs use; raises on wildcards/ranges/malformed input."""
    s = path.strip()
    if not s.startswith("$"):
        raise JsonPatchError(f"JSON path must start with $: {path!r}")
    pos = 1
    legs: list[str | int] = []
    while pos < len(s):
        if s[pos] == ".":
            m = _MEMBER.match(s, pos)
            if not m:
                raise JsonPatchError(f"bad member leg at {pos} in {path!r}")
            if m.group(1) is not None:
                legs.append(json.loads('"' + m.group(1) + '"'))
            else:
                legs.append(m.group(2))
            pos = m.end()
        elif s[pos] == "[":
            m = _INDEX.match(s, pos)
            if not m:
                raise JsonPatchError(f"bad array leg at {pos} in {path!r}")
            legs.append(int(m.group(1)))
            pos = m.end()
        else:
            raise JsonPatchError(f"unexpected {s[pos]!r} at {pos} in {path!r}")
    return legs


def _navigate(doc, legs: list[str | int], path: str):
    """Resolve all legs but the last; returns the parent container."""
    cur = doc
    for leg in legs[:-1]:
        if isinstance(leg, int):
            if not isinstance(cur, list) or leg >= len(cur):
                raise JsonPatchError(f"path {path!r} does not resolve")
            cur = cur[leg]
        else:
            if not isinstance(cur, dict) or leg not in cur:
                raise JsonPatchError(f"path {path!r} does not resolve")
            cur = cur[leg]
    return cur


def apply_json_diffs(doc, diffs) -> object:
    """Apply ``[(op, path, value), ...]`` to ``doc`` (a decoded JSON value)
    and return the new document. ``doc`` is not mutated. An empty diff
    vector returns the document unchanged (MySQL logs one for a JSON
    column the statement mentioned but did not change)."""
    doc = json.loads(json.dumps(doc))  # deep copy, JSON-type-normalized
    for op, path, value in diffs:
        legs = parse_json_path(path)
        if not legs:
            # root path: only REPLACE makes sense (MySQL never emits
            # INSERT/REMOVE at $)
            if op != DIFF_REPLACE:
                raise JsonPatchError(f"op {op} at root path")
            doc = value
            continue
        parent = _navigate(doc, legs, path)
        leg = legs[-1]
        if op == DIFF_REPLACE:
            if isinstance(leg, int):
                if not isinstance(parent, list) or leg >= len(parent):
                    raise JsonPatchError(f"REPLACE {path!r} does not resolve")
                parent[leg] = value
            else:
                if not isinstance(parent, dict) or leg not in parent:
                    raise JsonPatchError(f"REPLACE {path!r} does not resolve")
                parent[leg] = value
        elif op == DIFF_INSERT:
            if isinstance(leg, int):
                if not isinstance(parent, list):
                    raise JsonPatchError(f"INSERT {path!r}: parent not array")
                # insert shifts right; past-the-end appends
                parent.insert(min(leg, len(parent)), value)
            else:
                if not isinstance(parent, dict):
                    raise JsonPatchError(f"INSERT {path!r}: parent not object")
                if leg in parent:
                    raise JsonPatchError(f"INSERT {path!r}: member exists")
                parent[leg] = value
        elif op == DIFF_REMOVE:
            if isinstance(leg, int):
                if not isinstance(parent, list) or leg >= len(parent):
                    raise JsonPatchError(f"REMOVE {path!r} does not resolve")
                del parent[leg]
            else:
                if not isinstance(parent, dict) or leg not in parent:
                    raise JsonPatchError(f"REMOVE {path!r} does not resolve")
                del parent[leg]
        else:
            raise JsonPatchError(f"unknown diff operation {op}")
    return doc


def apply_serialized_patches(doc_json: str | None, patches) -> str | None:
    """Apply lsn-ordered serialized diff vectors (each a JSON array of
    ``[op, path, value]`` triples, the ``{col}_patch`` changelog format) to
    a JSON document TEXT. Returns compact JSON text."""
    if patches is None or len(patches) == 0:
        return doc_json
    if doc_json is None:
        raise JsonPatchError(
            "JSON diffs against a missing/NULL document — the upstream "
            "logged a partial update for a row image this table does not "
            "hold (corrupt or misordered stream)"
        )
    doc = json.loads(doc_json)
    for p in patches:
        doc = apply_json_diffs(doc, [tuple(d) for d in json.loads(p)])
    return json.dumps(doc, separators=(",", ":"), ensure_ascii=False)


def apply_patches_udf():
    """Arrow-batched pandas UDF ``(doc text, array<patch text>) → text``.
    Batches arrive via Arrow; the per-document loop is inherent to patch
    application (MySQL's replica applier is per-diff too) and only rows
    that actually carry patches reach the loop's slow lane."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _apply(docs: pd.Series, patches: pd.Series) -> pd.Series:
        out = []
        for doc, plist in zip(docs, patches):
            has = plist is not None and len(plist) > 0
            out.append(apply_serialized_patches(doc, plist) if has else doc)
        return pd.Series(out, dtype=object)

    return _apply
