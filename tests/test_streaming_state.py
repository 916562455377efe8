"""Custom stateful streaming operator (streaming/events.py
``stateful_first_sight``): per-key state carried across REAL
microbatches via applyInPandasWithState, pinned against both the batch
DataFrame answer and a DuckDB oracle.
"""

from __future__ import annotations

import os

import duckdb

from torscrapper_spark.streaming import events as EV

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _final_rows(sink_df):
    """Update-mode sinks re-emit a key each time its state changes; the
    final answer per key is the row with the max n_events (monotone)."""
    pdf = sink_df.toPandas()
    assert len(pdf) > len(pdf["user_id"].unique()), (
        "every key was emitted exactly once — the stream collapsed to a "
        "single microbatch and the state handoff was never exercised"
    )
    return (
        pdf.sort_values(["user_id", "n_events"])
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_stateful_first_sight_matches_batch_and_duckdb(spark):
    got = _final_rows(EV.stateful_first_sight(spark, SF_DIR, n_batches=4))
    oracle = duckdb.sql(f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_seen_us
        FROM '{SF_DIR}/events.parquet'
        GROUP BY user_id ORDER BY user_id
    """).df().reset_index(drop=True)
    assert got["user_id"].tolist() == oracle["user_id"].tolist()
    assert got["n_events"].tolist() == oracle["n_events"].tolist()
    assert got["first_seen_us"].tolist() == oracle["first_seen_us"].tolist()


def test_stateful_first_sight_batch_split_invariance(spark):
    """The final per-key answer must not depend on how rows were split
    into microbatches (count/min are order-independent reductions —
    the property that makes the operator deterministic at any
    parallelism, the crawl's core invariance)."""
    a = _final_rows(EV.stateful_first_sight(spark, SF_DIR, n_batches=2))
    b = _final_rows(EV.stateful_first_sight(spark, SF_DIR, n_batches=5))
    assert a.equals(b)
    # scratch lifetime bound: each call released its predecessor's
    # on-disk events copy (the module's one-per-session contract)
    assert len(EV._SCRATCH_DIRS) <= 1
