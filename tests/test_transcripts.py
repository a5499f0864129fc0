"""Conversation assembly / token-budget truncation / stratified sampling."""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from mysql_secure_agent_spark.operators.transcripts import (
    assemble_conversations,
    pack_sequences,
    sample_stratified,
    truncate_to_token_budget,
)


@pytest.fixture()
def turns_df(spark):
    rows = [
        # c1: 3 turns, out-of-order input (assembly must sort by turn_idx)
        Row(conv_id="c1", turn_idx=2, role="assistant", text="three tokens here"),
        Row(conv_id="c1", turn_idx=0, role="user", text="hello world"),
        Row(conv_id="c1", turn_idx=1, role="assistant", text="hi"),
        # c2: single turn, empty text
        Row(conv_id="c2", turn_idx=0, role="user", text=""),
        # c3: two turns
        Row(conv_id="c3", turn_idx=0, role="user", text="a b c d"),
        Row(conv_id="c3", turn_idx=1, role="tool", text="x y"),
    ]
    return spark.createDataFrame(rows)


def test_assemble_orders_and_counts(spark, turns_df):
    out = {r["conv_id"]: r for r in assemble_conversations(turns_df).collect()}
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["conversation"] == (
        "user: hello world\nassistant: hi\nassistant: three tokens here"
    )
    assert out["c1"]["n_tokens"] == 2 + 1 + 3
    assert out["c2"]["n_tokens"] == 0
    assert out["c3"]["conversation"] == "user: a b c d\ntool: x y"
    assert out["c3"]["n_tokens"] == 6


def test_truncate_keeps_longest_fitting_suffix(spark, turns_df):
    # c1 per-turn tokens = [2, 1, 3]; budget 4 → suffix [1, 3] fits (4), the
    # full conversation (6) does not
    out = {r["conv_id"]: r for r in truncate_to_token_budget(turns_df, budget=4).collect()}
    assert out["c1"]["kept_turns"] == 2
    assert out["c1"]["kept_tokens"] == 4
    assert out["c1"]["conversation"] == "assistant: hi\nassistant: three tokens here"
    # generous budget keeps everything
    out9 = {r["conv_id"]: r for r in truncate_to_token_budget(turns_df, budget=99).collect()}
    assert out9["c1"]["kept_turns"] == 3
    # zero budget: only zero-token suffixes fit; c1 keeps nothing
    out0 = {r["conv_id"]: r for r in truncate_to_token_budget(turns_df, budget=0).collect()}
    assert out0["c1"]["kept_turns"] == 0 and out0["c1"]["conversation"] == ""
    # an all-empty conversation (0 tokens) fits even a zero budget
    assert out0["c2"]["kept_turns"] == 1


def test_truncate_single_oversized_turn_drops(spark):
    df = spark.createDataFrame(
        [Row(conv_id="c", turn_idx=0, role="user", text="one two three four five")]
    )
    r = truncate_to_token_budget(df, budget=3).collect()[0]
    assert r["kept_turns"] == 0 and r["kept_tokens"] == 0


def test_sample_stratified_deterministic_and_rated(spark):
    df = spark.range(0, 20000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") % 10 < 7, "en").when(F.col("id") % 10 < 9, "de")
        .otherwise("rare").alias("lang"),
    )
    out = sample_stratified(
        df, rates={"en": 0.1, "de": 0.5, "rare": 1.0}, strata_col="lang", key_col="doc_id"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == totals["rare"]  # rate 1.0 keeps all
    assert abs(counts["en"] / totals["en"] - 0.1) < 0.02
    assert abs(counts["de"] / totals["de"] - 0.5) < 0.03
    # determinism: the same rows are selected on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_stratified(
            df, rates={"en": 0.1, "de": 0.5, "rare": 1.0},
            strata_col="lang", key_col="doc_id",
        ).collect()
    )
    assert a == b
    # default rate 0 drops unknown strata
    out2 = sample_stratified(df, rates={"en": 1.0}, strata_col="lang", key_col="doc_id")
    assert out2.filter(F.col("lang") != "en").count() == 0


def test_assemble_matches_pandas_oracle(spark):
    # randomized conversations vs a pure-pandas assembly
    import numpy as np

    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{int(x):03d}" for x in rng.integers(0, 40, n)],
            "turn_idx": rng.integers(0, 50, n).astype("int32"),
            "role": rng.choice(["user", "assistant"], n),
            "text": [" ".join(["w"] * int(k)) for k in rng.integers(0, 8, n)],
        }
    ).drop_duplicates(["conv_id", "turn_idx"])
    got = (
        assemble_conversations(spark.createDataFrame(pdf))
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    exp_rows = []
    for cid, g in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        conv = "\n".join(f"{r.role}: {r.text}" for r in g.itertuples())
        ntok = int(sum(len(t.split()) for t in g["text"]))
        exp_rows.append((cid, len(g), conv, ntok))
    exp = pd.DataFrame(exp_rows, columns=["conv_id", "n_turns", "conversation", "n_tokens"])
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_turns", "conversation", "n_tokens"]],
        exp,
        check_dtype=False,
    )


# ----------------------------------------------------------- pack_sequences
def test_pack_sequences_greedy_fill(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": ["a b c", "d e", "f g h i", "j", "k l m"],
            }
        )
    )
    # tokens: 3,2,4,1,3; budget 5, one shard. exclusive prefix: 0,3,5,9,10
    # seq = pre//5 -> 0,0,1,1,2
    out = {
        (r["shard"], r["seq"]): (r["n_docs"], r["n_tokens"], r["text"])
        for r in pack_sequences(docs, budget=5, shard_size=100).collect()
    }
    assert out[(0, 0)] == (2, 5, "a b c\nd e")
    assert out[(0, 1)] == (2, 5, "f g h i\nj")
    assert out[(0, 2)] == (1, 3, "k l m")


def test_pack_sequences_sharding_is_independent(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(8)), "text": ["x y"] * 8})
    )
    # shard_size=4 -> shards {0,1}; each packs its own prefix sums from zero
    out = pack_sequences(docs, budget=4, shard_size=4).collect()
    assert {r["shard"] for r in out} == {0, 1}
    for r in out:
        assert r["n_docs"] == 2 and r["n_tokens"] == 4


def test_pack_sequences_oversized_doc_gets_own_bin_overflow(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e f g", "h"]})
    )
    # doc 0 (7 tokens) overflows budget 3 alone in seq 0; doc 1 starts seq 2
    out = {r["seq"]: r for r in pack_sequences(docs, budget=3, shard_size=10).collect()}
    assert out[0]["n_docs"] == 1 and out[0]["n_tokens"] == 7
    assert 2 in out and out[2]["n_docs"] == 1


# ------------------------------------------------------------- loss spans
def test_loss_spans_offsets_and_masking(spark):
    from mysql_secure_agent_spark.operators.transcripts import (
        assemble_conversations,
        loss_spans,
    )

    rows = [
        ("c1", 0, "user", "hi there"),
        ("c1", 1, "assistant", "hello! café"),
        ("c1", 2, "tool", "lookup(x)"),
        ("c1", 3, "assistant", "done"),
        ("c2", 0, "assistant", None),  # null text: never trained
        ("c2", 1, "user", "q"),
        ("c2", 2, "assistant", "a"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    spans = loss_spans(df).collect()
    conv = {
        r["conv_id"]: r["conversation"]
        for r in assemble_conversations(df).collect()
    }
    # every span selects exactly its turn's text out of the rendered doc
    by_turn = {(r["conv_id"], r["turn_idx"]): r for r in spans}
    assert set(by_turn) == {("c1", 1), ("c1", 3), ("c2", 2)}
    for (cid, _), r in by_turn.items():
        assert conv[cid][r["span_start"] : r["span_end"]] == r["span_text"]
    assert by_turn[("c1", 1)]["span_text"] == "hello! café"
    assert by_turn[("c1", 3)]["span_text"] == "done"
    assert by_turn[("c2", 2)]["span_text"] == "a"
    # the masked region really is headers + other roles: remove spans and
    # no assistant content remains
    c1 = conv["c1"]
    masked = c1
    for r in sorted(
        (r for r in spans if r["conv_id"] == "c1"),
        key=lambda r: -r["span_start"],
    ):
        masked = masked[: r["span_start"]] + masked[r["span_end"] :]
    assert "hello" not in masked and "done" not in masked
    assert "user: hi there" in masked and "tool: lookup(x)" in masked


def test_loss_spans_custom_roles(spark):
    from mysql_secure_agent_spark.operators.transcripts import loss_spans

    df = spark.createDataFrame(
        [("c", 0, "tool", "t0"), ("c", 1, "user", "u1")],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = loss_spans(df, train_roles=("tool", "user")).collect()
    assert {(r["turn_idx"], r["span_text"]) for r in got} == {(0, "t0"), (1, "u1")}


def test_loss_spans_plan_one_exchange_no_python(spark):
    """The span fold rides the assembly's single groupBy exchange; the
    whole operator is Catalyst (no Python/Arrow nodes) — the 10^10-turn
    plan shape, regression-locked."""
    from mysql_secure_agent_spark.operators.transcripts import loss_spans

    df = spark.createDataFrame(
        [("c", 0, "assistant", "t")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = loss_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "ArrowEval" not in plan
