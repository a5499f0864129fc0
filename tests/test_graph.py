"""Connected components / canonical dedup keep-sets."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from mysql_secure_agent_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"]),
        schema="id_a bigint, id_b bigint",
    )


def test_components_basic(spark):
    # {1,2,3} via chain, {10,11}, 20 isolated-by-self-edge
    comp = {
        r["id"]: r["component"]
        for r in connected_components(
            _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_components_chain_needs_propagation(spark):
    # a path graph exercises multi-round convergence
    edges = [(i, i + 1) for i in range(8)]
    comp = {r["id"]: r["component"] for r in connected_components(_edges(spark, edges)).collect()}
    assert set(comp.values()) == {0}


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 99], "text": list("abcdef")})
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_canonical(
            docs, _edges(spark, [(1, 2), (2, 3), (10, 11)])
        ).collect()
    )
    # keep min of {1,2,3} and of {10,11}; 99 untouched
    assert kept == [1, 10, 99]


def _brute_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=20,
    )
)
def test_components_match_union_find(spark, pairs):
    got = {
        r["id"]: r["component"]
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    assert got == _brute_components(pairs)
