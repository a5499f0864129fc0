"""Debezium-envelope interop: sink AND source for the public CDC format.

The reference's output format is Fivetran-private JSONL
(``output/OutputSpec.java:46-97``); the rest of the CDC ecosystem —
Kafka Connect, Flink CDC, Iceberg/Hudi/Delta ingest jobs, every
"consume a MySQL change stream" tutorial — speaks Debezium's envelope
(public: debezium.io/documentation, MySQL connector event shapes):

  key:   {"conv_id": ..., "turn_idx": ...}
  value: {"before": {...}|null, "after": {...}|null,
          "source": {"name": S, "db": D, "table": T,
                     "file": "mysql-bin.NNNNNN", "pos": P, "ts_ms": MS},
          "op": "c"|"u"|"d"|"r", "ts_ms": MS}

plus a key-only TOMBSTONE (value = null) after each delete so
log-compacted Kafka topics drop the key. This module renders the engine's
changelog as Debezium records and parses Debezium records back into the
engine's changelog — both directions pure ``to_json``/``from_json``
(JVM-side, codegen; no Python in either path), file-dump representation
``{"key": K, "value": V}`` one record per line (the standard
kafkacat/connect file dump of a topic).

Semantics notes, both documented Debezium behaviors we map onto:
* our changelog carries net NEW images, so ``before`` is null on updates
  (Debezium emits that exact shape when the source logs
  ``binlog_row_image=MINIMAL``) and carries only the key on deletes;
* ``op='r'`` (snapshot read) parses like ``c`` — both are upserts here,
  the same fold the reference applies (``Updater.java:188-217``);
* ``source.pos`` carries the event lsn; a missing ``source`` block parses
  with a null lsn and is refused (ordering is the correctness contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_OP_OUT = {"I": "c", "U": "u", "D": "d"}


def to_debezium_records(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    *,
    server: str = "engine",
    db: str = "main",
    table: str = "transcripts",
    lsn_col: str = "source_lsn",
    op_col: str = "op",
    ts_ms_col: str | None = None,
    rotate_every: int = 1_000_000,
    tombstones: bool = True,
) -> DataFrame:
    """Changelog → one-line Debezium records (column ``value``). Op map
    I→c, U→u, D→d; deletes carry a key-only ``before`` and, when
    ``tombstones``, are followed by the compaction tombstone for the same
    key (ordering within a key is by line position, as in a topic
    partition)."""
    all_cols = list(dict.fromkeys([*key_cols, *value_cols]))
    key = F.struct(*[F.col(c).alias(c) for c in key_cols])
    after = F.struct(*[F.col(c).alias(c) for c in all_cols])
    before_del = F.struct(
        *[
            (F.col(c) if c in key_cols else F.lit(None)).alias(c)
            for c in all_cols
        ]
    )
    ts_ms = (
        F.col(ts_ms_col)
        if ts_ms_col
        else (F.col(lsn_col) % F.lit(1 << 41)).cast("long")  # deterministic
    )
    src = F.struct(
        F.lit(server).alias("name"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.format_string(
            "mysql-bin.%06d", (F.col(lsn_col) / rotate_every).cast("int")
        ).alias("file"),
        (F.col(lsn_col) % rotate_every).cast("long").alias("pos"),
        F.col(lsn_col).cast("long").alias("lsn"),
        ts_ms.alias("ts_ms"),
    )
    is_del = F.col(op_col) == "D"
    envelope = F.struct(
        F.when(is_del, before_del).alias("before"),
        F.when(~is_del, after).alias("after"),
        src.alias("source"),
        F.when(is_del, "d")
        .when(F.col(op_col) == "I", "c")
        .otherwise("u")
        .alias("op"),
        ts_ms.alias("ts_ms"),
    )
    # explicit nulls: Debezium envelopes carry "before": null / "after":
    # null literally (to_json drops null fields by default)
    rec = F.to_json(
        F.struct(key.alias("key"), envelope.alias("value")),
        {"ignoreNullFields": "false"},
    )
    base = df.select(
        F.col(lsn_col).alias("_lsn"), F.lit(0).alias("_seq"), rec.alias("value")
    )
    if tombstones:
        # a tombstone is the SAME key with a JSON-null value, sequenced just
        # after its delete record
        tomb = df.filter(is_del).select(
            F.col(lsn_col).alias("_lsn"),
            F.lit(1).alias("_seq"),
            F.concat(
                F.lit('{"key":'), F.to_json(key), F.lit(',"value":null}')
            ).alias("value"),
        )
        base = base.unionByName(tomb)
    # one range exchange + sort: the file dump is globally ordered like a
    # single topic partition (sorted part-file names = log order) — an
    # export sink, the cost is deliberate and matches binlog_export's
    # per-file sequential contract
    return base.orderBy("_lsn", "_seq").select("value")


def debezium_value_schema(cols_ddl: str) -> str:
    """DDL string for ``from_json`` over the envelope, given the row
    columns' DDL (e.g. ``"conv_id string, turn_idx int, text string"``)."""
    return (
        f"struct<before: struct<{cols_ddl}>, after: struct<{cols_ddl}>, "
        "source: struct<name string, db string, table string, file string, "
        "pos bigint, lsn bigint, ts_ms bigint>, "
        "op string, ts_ms bigint>"
    )


def from_debezium_records(
    lines: DataFrame,
    key_cols: list[str],
    cols: list[tuple[str, str]],
    *,
    value_col: str = "value",
    rotate_every: int = 1_000_000,
    partial_images: bool = False,
) -> DataFrame:
    """Debezium record lines → the engine changelog
    ``(op I|U|D, columns..., source_lsn)``. Tombstones (JSON-null value)
    are dropped — the delete event preceding them already carries the op.
    Records without a source position are REFUSED via a null source_lsn
    that the caller's merge will reject, because replay order is the
    correctness contract (T4).

    ROW-IMAGE CONTRACT: the feed is assumed to carry FULL after-images
    (Debezium's default, binlog_row_image=full) — non-key columns take the
    after-image verbatim on c/u/r, so an update-to-NULL is preserved. For
    a binlog_row_image=minimal/noblob producer (unchanged columns omitted,
    i.e. JSON-null in after), pass ``partial_images=True``: non-key columns
    then coalesce after→before (an omitted column keeps its old value).
    The two semantics are irreconcilable record-by-record — a JSON null is
    either "set to NULL" (full) or "unchanged" (partial) — so the caller
    must declare which feed it has; there is nothing in the record itself
    to detect it from."""
    if any(n == "source_lsn" for n, _ in cols):
        raise ValueError(
            "cols are the ROW columns; source_lsn comes from the envelope"
        )
    cols_ddl = ", ".join(f"{n} {t}" for n, t in cols)
    key_ddl = ", ".join(f"{n} {t}" for n, t in cols if n in key_cols)
    rec_schema = (
        f"struct<key: struct<{key_ddl}>, "
        f"value: {debezium_value_schema(cols_ddl)}>"
    )
    parsed = lines.select(
        F.from_json(F.col(value_col), rec_schema).alias("r")
    ).filter(F.col("r.value").isNotNull())
    op = (
        F.when(F.col("r.value.op") == "d", "D")
        .when(F.col("r.value.op") == "u", "U")
        .otherwise("I")  # c and r (snapshot read) both fold as inserts
    )
    lsn = F.coalesce(
        F.col("r.value.source.lsn"),
        F.regexp_extract(F.col("r.value.source.file"), r"(\d+)$", 1).cast(
            "long"
        )
        * rotate_every
        + F.col("r.value.source.pos"),
    )
    # a record without any position cannot be ordered — fail the scan
    # loudly instead of letting a null lsn silently lose last-image-wins
    lsn = F.when(
        lsn.isNull(),
        F.raise_error(
            F.lit("debezium record carries no source position (lsn/file+pos)")
        ),
    ).otherwise(lsn)
    # Key columns may come from after, the key struct, or the delete's
    # before-image (keys are never null, so coalesce is safe). Non-key
    # columns must take the after-image AS IS on c/u/r — a coalesce onto
    # the before-image would resurrect the OLD value whenever a FULL-image
    # feed (Debezium's default binlog_row_image) updates a column to NULL.
    def _nonkey(n: str):
        after = F.col(f"r.value.after.{n}")
        if partial_images:
            # minimal/noblob feed: an omitted (null) after column means
            # UNCHANGED — fall back to the before-image
            after = F.coalesce(after, F.col(f"r.value.before.{n}"))
        return F.when(
            F.col("r.value.op") == "d", F.col(f"r.value.before.{n}")
        ).otherwise(after)

    out_cols = [
        (
            F.coalesce(
                F.col(f"r.value.after.{n}"),
                F.col(f"r.key.{n}"),
                F.col(f"r.value.before.{n}"),
            )
            if n in key_cols
            else _nonkey(n)
        ).alias(n)
        for n, _ in cols
    ]
    return parsed.select(op.alias("op"), *out_cols, lsn.alias("source_lsn"))


def write_debezium(
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    value_cols: list[str],
    **kwargs,
) -> None:
    """Render and write the record lines as text files (topic file dump)."""
    to_debezium_records(df, key_cols, value_cols, **kwargs).write.mode(
        "overwrite"
    ).text(out_dir)


def read_debezium(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    cols: list[tuple[str, str]],
    **kwargs,
) -> DataFrame:
    return from_debezium_records(
        spark.read.text(path), key_cols, cols, **kwargs
    )


def from_debezium_schema_changes(
    lines,
    schema_name: str,
    table_name: str,
    *,
    value_col: str = "value",
    rotate_every: int = 1_000_000,
    strict: bool = True,
):
    """Debezium SCHEMA-CHANGE topic messages → the engine's structured DDL
    frame (the ``ddl.parquet`` sidecar shape the streaming pipeline orders
    by ``ddl_hwm``: source_lsn, action, column_name, column_type,
    new_name).

    Debezium publishes DDL as ``{"databaseName": D, "ddl": "ALTER TABLE
    …", "source": {...}}`` records on a schema-change topic (public MySQL
    connector format), optionally wrapped in the Kafka Connect
    ``{"schema":…, "payload":…}`` envelope. The SQL text routes through
    the SAME ALTER grammar as wire QUERY events (``sources/ddl_parse``),
    so both ingestion paths cannot drift. Statements for other tables and
    non-DDL records are dropped; position comes from ``source.lsn`` or
    ``source.file``+``pos`` (the changelog reader's encoding).

    Driver-side parse (``.collect()``): a schema topic is O(DDL
    statements) — metadata, not data."""
    import json as _json
    import re as _re

    import pandas as pd

    from ..sources.ddl_parse import parse_query_ddl

    if hasattr(lines, "collect"):
        texts = [r[value_col] for r in lines.select(value_col).collect()]
    else:
        texts = list(lines)
    out = []
    for line in texts:
        if not line or not line.strip():
            continue
        d = _json.loads(line)
        payload = d.get("payload", d)
        ddl = payload.get("ddl")
        if not ddl:
            continue
        src = payload.get("source") or {}
        lsn = src.get("lsn")
        if lsn is None and src.get("file") is not None:
            m = _re.search(r"(\d+)$", src["file"])
            lsn = (int(m.group(1)) if m else 0) * rotate_every + int(
                src.get("pos") or 0
            )
        for act in parse_query_ddl(
            payload.get("databaseName") or "",
            ddl,
            schema_name,
            table_name,
            strict=strict,
        ):
            if act["action"] == "UNSUPPORTED":
                continue
            out.append(
                {
                    "source_lsn": int(lsn or 0),
                    "action": act["action"],
                    "column_name": act["column_name"],
                    "column_type": act["column_type"],
                    "new_name": act["new_name"],
                }
            )
    return pd.DataFrame(
        out,
        columns=["source_lsn", "action", "column_name", "column_type", "new_name"],
    )
