"""Property tests: new operators vs brute-force references.

Mirrors the codec property suite's strategy (SURVEY §5): hypothesis drives
randomized inputs through the Spark operator AND a straight-line Python
reference; any divergence is a real semantics bug, not a fixture gap.
Sessions are expensive, so examples are kept small and deadline disabled.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from mysql_secure_agent_spark.operators.asof import asof_join
from mysql_secure_agent_spark.operators.transcripts import pack_sequences

KEYS = ["a", "b"]


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
            min_size=1, max_size=12,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
            min_size=0, max_size=12, unique=True,
        )
    )
    strict = draw(st.booleans())
    return left, right, strict


def _brute_asof(left, right, strict):
    out = []
    for k, t in left:
        cands = [
            rt for (rk, rt) in right
            if rk == k and (rt < t if strict else rt <= t)
        ]
        out.append((k, t, f"v{k}{max(cands)}" if cands else None))
    return sorted(out)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_matches_bruteforce(spark, case):
    left, right, strict = case
    ldf = spark.createDataFrame(
        pd.DataFrame(left, columns=["k", "t"]).assign(
            rowid=range(len(left))
        )
    )
    rpdf = pd.DataFrame(right, columns=["k", "rt"])
    rpdf["v"] = ["v" + k + str(rt) for k, rt in right]
    rdf = spark.createDataFrame(rpdf, schema="k string, rt bigint, v string")
    got = sorted(
        (r["k"], r["t"], r["v"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_on="t", right_on="rt", strict=strict
        ).collect()
    )
    assert got == _brute_asof(left, right, strict)


@st.composite
def pack_case(draw):
    texts = draw(
        st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=12),
            min_size=1, max_size=15,
        )
    )
    budget = draw(st.integers(1, 6))
    shard_size = draw(st.sampled_from([4, 100]))
    return texts, budget, shard_size


def _tok(t: str) -> int:
    return len(t.split())


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pack_case())
def test_pack_sequences_invariants(spark, case):
    texts, budget, shard_size = case
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = pack_sequences(
        docs, budget=budget, shard_size=shard_size
    ).collect()
    # every doc appears exactly once, in id order within its sequence
    reassembled = []
    for r in sorted(rows, key=lambda r: (r["shard"], r["seq"])):
        parts = r["text"].split("\n") if r["text"] != "" else [""]
        # n_docs matches the join arity (empty docs join as empty strings)
        assert r["n_docs"] >= 1
        assert r["n_tokens"] == sum(_tok(p) for p in parts)
        reassembled.extend(parts)
    # token-preserving partition of the corpus (order within shard preserved)
    assert sum(_tok(t) for t in reassembled) == sum(_tok(t) for t in texts)
    assert len(reassembled) == len(texts)
    # greedy fill: a sequence exceeds the budget only via its LAST doc
    for r in rows:
        parts = r["text"].split("\n") if r["text"] != "" else [""]
        toks = [_tok(p) for p in parts]
        assert sum(toks[:-1]) <= budget


# ---------------------------------------------------- ExactSubstr dedup
@st.composite
def substr_case(draw):
    # tiny vocab forces frequent duplicated runs; n small keeps spans rich
    vocab = ["a", "b", "c", "d"]
    docs = draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=14).map(
                " ".join
            ),
            min_size=1,
            max_size=5,
        )
    )
    n = draw(st.integers(2, 4))
    return docs, n


def _brute_spans(docs, n):
    """Straight-line reference: gram occurrences, canonical election by
    (doc_id, pos), merged [p, p+n) windows with the fold's adjacency rule
    (break when p > prev_pos + n)."""
    occ = {}
    for did, text in enumerate(docs):
        toks = text.strip().lower().split()
        for p in range(len(toks) - n + 1):
            occ.setdefault(" ".join(toks[p : p + n]), []).append((did, p))
    dup_pos = {}
    for places in occ.values():
        if len(places) > 1:
            canon = min(places)
            for did, p in places:
                if (did, p) != canon:
                    dup_pos.setdefault(did, set()).add(p)
    out = set()
    for did, ps in dup_pos.items():
        run = []
        for p in sorted(ps):
            if run and p <= run[-1] + n:
                run.append(p)
            else:
                if run:
                    out.add((did, run[0], run[-1] + n))
                run = [p]
        if run:
            out.add((did, run[0], run[-1] + n))
    return out


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(substr_case())
def test_duplicated_spans_matches_bruteforce(spark, case):
    from mysql_secure_agent_spark.operators.substr_dedup import (
        duplicated_spans,
    )

    docs, n = case
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=n).collect()
    }
    assert got == _brute_spans(docs, n)
