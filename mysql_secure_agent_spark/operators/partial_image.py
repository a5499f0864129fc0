"""Partial (MINIMAL) row-image folding — binlog_row_image=MINIMAL support.

With ``binlog_row_image=MINIMAL`` MySQL logs only the changed columns (plus
the PK) in each after-image, so a changelog row's NULL is ambiguous: it is
either "column not in this image" (keep the previous value) or "column set to
NULL". The reference agent never faces this — it assumes FULL images
(``RowParser.java`` parses every included column and the Updater replaces
whole rows, ``Updater.java:148-186``). This module makes MINIMAL feeds
first-class: each changelog row carries a ``_present`` array of the column
names its image actually contained (``packets_to_changelog(emit_presence=
True)`` produces it from the wire's included-columns bitmaps), and the fold
below collapses a micro-batch to one NET event per key where every column
takes its **last-present** value — unchanged columns fall back to the
pre-batch table state, not NULL.

Scale shape: the fold is a single ``groupBy(key)`` whose aggregates are all
``max(struct(lsn, …))`` — Catalyst plans partial (map-side) aggregation, so
hot keys collapse inside each scan task and one row per key crosses the
shuffle; no window, no sort. Delete handling needs no second pass either:
the last delete's lsn is itself a ``max`` aggregate, and a folded column is
discarded post-agg when its image predates that delete (the row was
re-created inside the batch, so pre-delete images are void and absent
columns reset to NULL rather than inheriting pre-delete or base values).

The present-but-NULL case survives because values travel inside structs:
``max(when(present, struct(lsn, col)))`` is NULL only when no image carried
the column; an image that carried an explicit NULL yields a non-null struct
with a null field, which correctly overwrites the base value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRESENCE_COL = "_present"


def fold_partial_images(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    presence_col: str = PRESENCE_COL,
    order_col: str = "source_lsn",
    json_patch_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a partial-image changelog to one net event per key.

    Input rows: ``op`` (I/U/D) + key cols (always present in every image) +
    value cols (NULL when absent) + ``presence_col`` (array<string> of value
    column names the image carried; key columns may be listed but are
    ignored) + ``order_col`` (globally unique, monotone).

    Output: one row per key with
      * ``op`` — 'D' if the key's last event is a delete, else 'U';
      * per value column ``c``: ``c`` (the last-present value, NULL when no
        surviving image carried it) and ``c_set`` (boolean: True when some
        image at or after the last delete carried the column — i.e. the
        folded value is authoritative, including an explicit NULL);
      * ``_base_applies`` — False iff a delete occurred in the batch: the
        row was dropped (and possibly re-created), so columns never set
        after that point must reset to NULL instead of inheriting the
        pre-batch table image;
      * ``order_col`` — the key's max lsn (merge ordering / lineage);
      * per JSON-patch column ``c`` (``json_patch_cols``, partial-JSON
        MINIMAL feeds): ``{c}_patches`` — the lsn-ordered serialized diff
        vectors newer than both the last full image of ``c`` and the last
        delete, to be applied on top of the folded (or base) document by
        :func:`resolve_against_base`. Patch ordering inside the group uses
        ``sort_array`` over ``collect_list`` — an aggregate, not a window,
        so the fold keeps its single-exchange partial-agg shape.
    """
    json_patch_cols = json_patch_cols or []
    has = {
        c: F.array_contains(F.col(presence_col), c) & (F.col("op") != F.lit("D"))
        for c in value_cols
    }
    aggs = [
        F.max(F.struct(F.col(order_col), F.col("op"))).alias("_last"),
        F.max(F.when(F.col("op") == "D", F.col(order_col))).alias("_del_lsn"),
    ]
    for c in value_cols:
        aggs.append(
            F.max(F.when(has[c], F.struct(F.col(order_col), F.col(c)))).alias(
                f"_f_{c}"
            )
        )
    for c in json_patch_cols:
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col(f"{c}_patch").isNotNull()
                        & (F.col("op") != F.lit("D")),
                        F.struct(F.col(order_col), F.col(f"{c}_patch").alias("patch")),
                    )
                )
            ).alias(f"_p_{c}")
        )
    agg = df.groupBy(*key_cols).agg(*aggs)

    # A folded image survives only if it post-dates the last delete: the max
    # struct is the LATEST present image, so max-lsn ≤ del_lsn means no image
    # after the delete carried the column at all.
    del_lsn = F.coalesce(F.col("_del_lsn"), F.lit(-(1 << 62)))
    out_cols: list[F.Column] = [
        F.when(F.col("_last.op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op")
    ]
    out_cols += [F.col(c) for c in key_cols]
    for c in value_cols:
        alive = F.col(f"_f_{c}").isNotNull() & (F.col(f"_f_{c}.{order_col}") > del_lsn)
        out_cols.append(F.when(alive, F.col(f"_f_{c}.{c}")).alias(c))
        out_cols.append(alive.alias(f"{c}_set"))
    for c in json_patch_cols:
        # patches older than the last full image (it embeds them) or the
        # last delete (the row they patched is gone) are void
        cutoff = F.greatest(
            F.coalesce(F.col(f"_f_{c}.{order_col}"), F.lit(-(1 << 62))),
            del_lsn,
        )
        out_cols.append(
            F.transform(
                F.filter(
                    F.col(f"_p_{c}"), lambda x: x[order_col] > cutoff
                ),
                lambda x: x["patch"],
            ).alias(f"{c}_patches")
        )
    out_cols.append(F.col("_del_lsn").isNull().alias("_base_applies"))
    out_cols.append(F.col(f"_last.{order_col}").alias(order_col))
    return agg.select(*out_cols)


def resolve_against_base(
    folded: DataFrame,
    base: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    json_patch_cols: list[str] | None = None,
) -> DataFrame:
    """Turn folded partial images into FULL-image changelog rows by filling
    never-set columns from the pre-batch table state (``base`` — the current
    reconciled image per key, full columns).

    Per column: the folded value when ``c_set`` (covers explicit NULLs);
    else the base value, but only while ``_base_applies`` (no delete voided
    the base row inside the batch). Deletes pass through as tombstones.

    The join is a LEFT join from the folded batch (one row per touched key)
    to ``base``; callers should pass a base already pruned to the touched
    buckets — the batch side is small, the base side scans O(touched
    buckets), never the whole table.

    For JSON-patch columns (``json_patch_cols``) the surviving diff vectors
    are then applied ON TOP of the resolved document (the in-batch folded
    full image when one exists, else the base image) by one Arrow-batched
    pandas UDF — the only Python on the path, per patched row, exactly the
    work MySQL's own replica applier does per diff (json_diff.cc
    apply_json_diff). A patch against a missing/NULL document raises: MySQL
    falls back to logging the full document whenever a diff cannot apply,
    so an inapplicable diff at merge time means the stream is corrupt and
    silently skipping would fork the replica.
    """
    json_patch_cols = json_patch_cols or []
    b = base.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"_base_{c}") for c in value_cols],
    )
    joined = folded.join(b, on=key_cols, how="left")
    sel: list[F.Column] = [F.col("op")] + [F.col(c) for c in key_cols]
    for c in value_cols:
        resolved = (
            F.when(F.col(f"{c}_set"), F.col(c))
            .when(F.col("_base_applies"), F.col(f"_base_{c}"))
        )
        if c in json_patch_cols:
            from ..functions.json_patch import apply_patches_udf

            patches = F.col(f"{c}_patches")
            resolved = F.when(
                patches.isNotNull() & (F.size(patches) > 0),
                apply_patches_udf()(resolved, patches),
            ).otherwise(resolved)
        sel.append(resolved.alias(c))
    sel.append(F.col("source_lsn"))
    return joined.select(*sel)
