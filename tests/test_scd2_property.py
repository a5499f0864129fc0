"""Property test: incremental SCD-2 maintenance vs a sequential fold.

hypothesis drives random op sequences (I/U/D over few keys, random batch
split points) through create_history_table + merge_history per batch, and
compares the reconciled history against a straight-line Python fold of the
same events — covering interval closing across arbitrary batch boundaries,
delete-closes, re-inserts, and keys whose whole life fits in one batch.
Sessions are expensive, so examples are few and deadline is disabled.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.operators.scd2 import (
    create_history_table,
    merge_history,
    read_history,
)

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("source_lsn", T.LongType(), False),
    ]
)


@st.composite
def scd2_case(draw):
    raw = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["I", "U", "D"]),
                st.integers(0, 2),
                st.integers(0, 9),
            ),
            min_size=1,
            max_size=16,
        )
    )
    events = [
        (op, k, None if op == "D" else v, 10 * (i + 1))
        for i, (op, k, v) in enumerate(raw)
    ]
    n_cuts = draw(st.integers(0, 2))
    cuts = sorted(
        draw(
            st.sets(
                st.integers(1, max(1, len(events) - 1)),
                min_size=min(n_cuts, len(events) - 1) if len(events) > 1 else 0,
                max_size=min(n_cuts, max(0, len(events) - 1)),
            )
        )
    )
    return events, cuts


def _brute(events):
    rows: dict = {}
    open_: dict = {}
    for op, k, v, lsn in sorted(events, key=lambda e: e[3]):
        if k in open_:
            rows[(k, open_[k])][1] = lsn
            del open_[k]
        if op != "D":
            rows[(k, lsn)] = [v, None]
            open_[k] = lsn
    return {
        (k, f): (v, t, t is None) for (k, f), (v, t) in rows.items()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scd2_case())
def test_incremental_scd2_equals_sequential_fold(spark, tmp_path_factory, case):
    events, cuts = case
    root = str(tmp_path_factory.mktemp("scd2p") / "h")
    src = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    tbl = create_history_table(root, src, ["k"], n_buckets=4, overwrite=True)
    bounds = [0, *cuts, len(events)]
    for i in range(len(bounds) - 1):
        part = events[bounds[i] : bounds[i + 1]]
        if not part:
            continue
        merge_history(
            spark, tbl, spark.createDataFrame(part, SCHEMA), f"b{i}"
        )
    got = {
        (r.k, r.valid_from_lsn): (r.v, r.valid_to_lsn, r.is_current)
        for r in read_history(spark, tbl).collect()
    }
    assert got == _brute(events)
