"""Conversation-level operators for training-data pipelines.

The engine's target table is multi-turn conversation transcripts keyed
(conv_id, turn_idx) — one row per turn. A training pipeline consumes
CONVERSATIONS, not turns: the missing step is assembling ordered turns into
one training example per conversation, under a token budget, and sampling a
training mix. Both are pure Catalyst compositions (no UDFs, no Python in the
hot path):

* assemble_conversations — groupBy(conv_id) + sort_array(collect_list(struct))
  renders each conversation as one ``role: text`` document with turn/token
  counts. One shuffle of (conv_id, turn-struct) rows; the per-group state is
  bounded by conversation length (transcripts are shallow — tens of turns),
  so no windowed sort or secondary skew handling is needed at 10^10 turns.
* truncate_to_token_budget — keeps the LAST turns whose running token total
  fits the budget (context-window semantics: most-recent context survives).
  Array algebra over the collected struct list; per-conversation cost is
  O(turns²) worst-case inside one executor row — bounded, never shuffled.
* sample_stratified — deterministic hash-based sampling with per-stratum
  rates (a training-mix knob: e.g. keep 100% of rare languages, 5% of the
  dominant one). ``pmod(h32(key), 1e6) < rate·1e6`` — reproducible across
  engines/runs, no RNG state, embarrassingly parallel, and the SAME rows
  are kept on re-runs (important when the corpus is re-materialized
  incrementally).

Reference parity note: the reference agent stops at the changelog
(``output/Event.java``); these operators are the downstream consumer the
BASELINE.json north star targets (transcript training data at 10^10 events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text_analysis import token_count_col
from .text_dedup import _h32


def _turn_struct(role_col: str, text_col: str, turn_col: str):
    return F.struct(
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
    )


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One row per conversation: turns ordered by ``turn_idx`` and rendered
    as ``role: text`` lines joined by newlines, plus turn/token counts.

    Plan: a single groupBy(conv_id) shuffle carrying (turn_idx, role, text)
    structs; ``sort_array`` orders by the struct's leading field (turn_idx) —
    no window, no per-group sort exchange. Token count is whitespace tokens
    summed over turns (the cheap token proxy used across the text operators).
    """
    turns = F.sort_array(F.collect_list(_turn_struct(role_col, text_col, turn_col)))
    toks = token_count_col
    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(turns.alias("_turns"))
        .select(
            "conv_id",
            F.size("_turns").alias("n_turns"),
            F.array_join(
                F.transform(
                    "_turns", lambda t: F.concat_ws(": ", t["role"], t["text"])
                ),
                "\n",
            ).alias("conversation"),
            F.aggregate(
                F.transform("_turns", lambda t: toks(t["text"])),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("n_tokens"),
        )
    )


def truncate_to_token_budget(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Context-window assembly: per conversation, keep the LONGEST SUFFIX of
    turns whose total whitespace-token count fits ``budget`` (most-recent
    context survives, the standard chat-training convention). A turn that
    alone exceeds the budget drops too — kept_turns may be 0.

    Implementation is array algebra on the collected turn list: for each
    candidate suffix start i, the suffix token sum is computed with
    ``aggregate(slice(...))``; the smallest i whose suffix fits wins. The
    O(turns²) arithmetic happens inside ONE executor row per conversation —
    never shuffled, bounded by conversation depth, vectorized by codegen.
    """
    turns = F.sort_array(F.collect_list(_turn_struct(role_col, text_col, turn_col)))
    per_turn = F.transform("_turns", lambda t: token_count_col(t["text"]))
    agg = df.groupBy(F.col(conv_col).alias("conv_id")).agg(turns.alias("_turns"))
    with_counts = agg.withColumn("_tok", per_turn).withColumn(
        "_n", F.size("_turns")
    )
    # suffix_sum(i) = sum(_tok[i..n)) for 1-based i; first i with sum <= budget
    suffix_ok = F.filter(
        F.sequence(F.lit(1), F.col("_n")),
        lambda i: F.aggregate(
            F.slice("_tok", i, F.col("_n") - i + 1),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        <= F.lit(budget),
    )
    start = F.when(F.size(suffix_ok) > 0, F.element_at(suffix_ok, 1)).otherwise(
        F.col("_n") + 1
    )
    kept = F.slice("_turns", start, F.greatest(F.col("_n") - start + 1, F.lit(0)))
    return with_counts.select(
        "conv_id",
        F.col("_n").alias("n_turns"),
        F.size(kept).alias("kept_turns"),
        F.aggregate(
            F.transform(kept, lambda t: token_count_col(t["text"])),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("kept_tokens"),
        F.array_join(
            F.transform(kept, lambda t: F.concat_ws(": ", t["role"], t["text"])),
            "\n",
        ).alias("conversation"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_size: int = 16384,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences: greedy
    contiguous fill in ``id_col`` order — the standard concat-short-docs
    step before a tokenizer truncates/pads to context length.

    A document lands in sequence ``floor(exclusive_prefix_tokens / budget)``
    of its shard; a sequence may overrun the budget by at most its last
    document (concat-then-truncate convention, so no token is lost to
    fragmentation at pack time). Deterministic: same input -> same packing,
    on every engine.

    Scale shape: packing is SHARDED — the running token sum is windowed per
    ``floor(id / shard_size)``, so each window sorts a bounded shard, shards
    pack independently in parallel, and no global single-partition window
    ever exists (the naive global cumsum is a driver-sized straggler at
    10^9 docs). Cross-shard sequences are deliberately not formed: the only
    loss is <= one underfull sequence per shard, negligible for
    shard_size >> budget/avg_doc_tokens.
    """
    from pyspark.sql import Window

    toks = token_count_col(F.col(text_col))
    shard = F.floor(F.col(id_col) / F.lit(shard_size)).cast("long")
    with_tok = df.select(
        F.col(id_col), F.col(text_col), toks.alias("_tok"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (F.sum("_tok").over(w) - F.col("_tok")).alias("_pre")
    binned = with_tok.select(
        "*", F.floor(pre / F.lit(budget)).cast("long").alias("seq")
    )
    packed = F.sort_array(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(text_col).alias("t")))
    )
    return (
        binned.groupBy("shard", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            packed.alias("_docs"),
        )
        .select(
            "shard",
            "seq",
            "n_docs",
            "n_tokens",
            F.array_join(
                F.transform("_docs", lambda d: d["t"]), "\n"
            ).alias("text"),
        )
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``pmod(h32(key), denom) < rate(stratum)·denom``.

    The hash is the portable md5-derived 32-bit hash used across the text
    operators, so (a) the SAME keys are selected on every run and engine —
    an incremental re-materialization of the corpus keeps its sample stable —
    and (b) the oracle can run the identical math. Rows whose stratum is not
    in ``rates`` get ``default_rate``. Pure filter: no shuffle, no RNG, scales
    trivially; the selection per stratum is unbiased because h32 is uniform
    over keys.
    """
    rate = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(stratum)
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(
            cond, F.lit(float(r))
        )
    rate_col = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    bucket = F.pmod(_h32(F.col(key_col).cast("string")), F.lit(denom))
    # explicit round: cast("long") TRUNCATES, so a rate like 0.29 (whose
    # float product is 289999.99999…) would silently drop one bucket — and
    # DuckDB's CAST rounds, so the two engines would disagree off the
    # exactly-representable rates
    return df.filter(bucket < F.round(rate_col * denom).cast("long"))


def loss_spans(
    df: DataFrame,
    train_roles: tuple[str, ...] = ("assistant",),
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """SFT loss masking: character spans of the TRAINED turns' content
    inside the assembled conversation.

    Supervised fine-tuning computes loss only on the assistant's tokens;
    everything else (user/tool turns, the ``role: `` headers, separators)
    is masked. This emits one row per trained turn: ``(conv_id, turn_idx,
    span_start, span_end, span_text)`` where ``[span_start, span_end)`` are
    0-based character offsets into the exact conversation string
    ``assemble_conversations`` renders (``role: text`` lines joined by
    ``\\n``), covering the turn's text only — the header and trailing
    newline stay masked. ``span_text`` is the substring the offsets select,
    so a consumer (and the oracle) can verify the mask against the rendered
    document instead of trusting the arithmetic.

    Plan: the same single groupBy(conv_id) shuffle as assembly; offsets are
    one ``F.aggregate`` fold over the sorted turn structs (running offset +
    appended spans — O(turns) per conversation, executor-local), then an
    explode back to one row per trained turn. No windows, no UDFs.

    NULL-text turns render as just ``role`` (concat_ws skips nulls) and are
    never trained (there is no content to span).
    """
    turns = F.sort_array(F.collect_list(_turn_struct(role_col, text_col, turn_col)))
    acc0 = F.struct(
        F.lit(0).cast("int").alias("off"),
        F.expr(
            "CAST(array() AS array<struct<turn_idx:int,start:int,end:int>>)"
        ).alias("spans"),
    )

    def step(acc, t):
        line = F.concat_ws(": ", t["role"], t["text"])
        llen = F.length(line)
        span = F.struct(
            t["turn_idx"].cast("int").alias("turn_idx"),
            (acc["off"] + F.length(t["role"]) + F.lit(2)).cast("int").alias("start"),
            (acc["off"] + llen).cast("int").alias("end"),
        )
        is_train = t["role"].isin(*train_roles) & t["text"].isNotNull()
        return F.struct(
            (acc["off"] + llen + F.lit(1)).cast("int").alias("off"),
            F.when(is_train, F.array_append(acc["spans"], span))
            .otherwise(acc["spans"])
            .alias("spans"),
        )

    assembled = (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(turns.alias("_turns"))
        .select(
            "conv_id",
            F.array_join(
                F.transform(
                    "_turns", lambda t: F.concat_ws(": ", t["role"], t["text"])
                ),
                "\n",
            ).alias("_conversation"),
            F.aggregate("_turns", acc0, step)["spans"].alias("_spans"),
        )
    )
    s = F.col("_s")
    return (
        assembled.select(
            "conv_id", "_conversation", F.explode("_spans").alias("_s")
        )
        .select(
            "conv_id",
            s["turn_idx"].alias("turn_idx"),
            s["start"].alias("span_start"),
            s["end"].alias("span_end"),
            F.col("_conversation")
            .substr(s["start"] + 1, s["end"] - s["start"])
            .alias("span_text"),
        )
    )
