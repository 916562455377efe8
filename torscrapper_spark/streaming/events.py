"""Structured Streaming surface over the ``events`` table.

These are real ``readStream`` → stateful transform → memory-sink
queries, driven to completion synchronously with
``processAllAvailable`` (bounded input), then returned as ordinary
DataFrames so the driver can compare them against batch SQL oracles:
over a bounded replay, a tumbling-window count / session window /
streaming dedup produces exactly the batch answer, which is what makes
the oracle comparison meaningful.

On a real deployment the source line changes to Kafka/files-on-arrival
and the memory sink to a parquet/Iceberg sink — the transform stays.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Lifetime bound for per-call scratch state (same pattern as
# queries._Q33_CACHE): the returned sink table must stay readable for
# the caller, so each invocation instead releases its PREDECESSOR's
# scratch dir / memory table — bounding the leak to one per kind per
# session instead of one per invocation across every repeat.
_SCRATCH_DIRS: list[str] = []
_SINK_TABLES: list[str] = []


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table (file source needs a directory,
    so the single parquet file is symlinked into a scratch dir)."""
    import shutil

    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    d = tempfile.mkdtemp(prefix="evstream_")
    _SCRATCH_DIRS.append(d)
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), f"{d}/events.parquet")
    s = spark.readStream.schema(schema).parquet(d)
    # watermarks/event-time ops require TIMESTAMP; the parquet column is
    # NTZ (session tz is pinned UTC by callers, so the instant is stable)
    return s.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Start → drain → stop a streaming query; return the sink table."""
    spark = df.sparkSession
    while _SINK_TABLES:
        try:
            spark.catalog.dropTempView(_SINK_TABLES.pop())
        except Exception:
            pass  # different session or already gone
    name = "snk_" + uuid.uuid4().hex[:12]
    # registered for predecessor-purge BEFORE start(): the memory sink
    # creates the temp view at start, so a query that fails mid-drain
    # must still leave its view on the purge list — appending only
    # after success leaked one snk_* view per failed call (code-review
    # r5)
    _SINK_TABLES.append(name)
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window counts + integer-cent sums per type,
    with a watermark bounding state (late rows beyond 1h dropped)."""
    s = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(
        F.window(F.col("ts"), "10 minutes").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    # complete mode: over a bounded replay, append would hold back the
    # final windows still inside the watermark horizon
    out = run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("win.start").cast("timestamp")).alias("win_start_us"),
        "event_type", "n", "cents",
    )


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly
    two overlapping windows (duration/slide = 2), the streaming shape
    for wave-rate dashboards smoother than a tumbling bucket."""
    s = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(
        F.window(F.col("ts"), "10 minutes", "5 minutes").alias("win")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("win.start").cast("timestamp")).alias("win_start_us"),
        "n", "cents",
    )


def session_counts(spark: SparkSession, sf_dir: str, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-merged) — the streaming analogue of
    sessionization; emits (user_id, session_start, n_events)."""
    s = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(
        F.session_window(F.col("ts"), gap).alias("sw"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("sw.start").cast("timestamp")).alias("session_start_us"),
        "n_events",
    )


def stateful_first_sight(
    spark: SparkSession, sf_dir: str, n_batches: int = 4
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    — the streaming analogue of the URL-seen filter with state richer
    than the built-in dedup can hold (SURVEY.md A7; built-ins stop at
    ``dropDuplicatesWithinWatermark``): per key, an arbitrary state
    tuple (here total sightings + first-seen event time) carried across
    microbatches, exactly what a streaming frontier ingest needs to
    answer "have we seen this URL, when first, how often re-linked".

    The events table is split into ``n_batches`` files and streamed
    with ``maxFilesPerTrigger=1``, so the state handoff between REAL
    microbatches is what's under test, not a single-batch degenerate
    run. Update-mode output re-emits a key's row each time its state
    changes; the per-key row with the max ``n_events`` is the final
    answer and equals the batch ``groupBy(user_id).agg(count, min(ts))``
    — the oracle comparison in tests/test_streaming_state.py.

    100-TB posture: state lives in the state store partitioned by key
    (RocksDB-backed on a real cluster), one shuffle on user_id per
    microbatch — identical shape to the built-in stateful ops; the
    pandas function sees one Arrow batch iterator per key per batch and
    never materializes the stream.
    """
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    # honor the module's one-scratch-per-session lifetime bound: release
    # every predecessor (this function writes a full parquet copy of the
    # events table per call — stream_events' purge loop, same reason)
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = tempfile.mkdtemp(prefix="evstate_")
    _SCRATCH_DIRS.append(d)
    src = os.path.join(d, "src")
    # any row-to-file split works: both state reductions (count, min)
    # are order- and partition-independent
    ev.repartition(n_batches).write.parquet(src)
    s = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )

    def track(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 — runs on executors

        n, first = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)  # SQL count(*): null-ts rows still count
            ts = pdf["ts_us"].dropna()  # SQL min: nulls ignored — an
            # all-null chunk must not crash int(NaN); a user whose every
            # ts is null keeps first=None (SQL min → NULL)
            if len(ts):
                m = int(ts.min())
                first = m if first is None or m < first else first
        state.update((n, first))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "first_seen_us": [first]}
        )

    out = s.groupBy("user_id").applyInPandasWithState(
        track,
        "user_id long, n_events long, first_seen_us long",
        "n long, first long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "update")


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id (the streaming analogue of
    the URL-seen filter, SURVEY.md A7) followed by a per-type count."""
    s = stream_events(spark, sf_dir).withWatermark("ts", "2 hours")
    dedup = s.dropDuplicatesWithinWatermark(["event_id"])
    agg = dedup.groupBy("event_type").agg(F.count("*").alias("n"))
    return run_to_memory(agg, "complete")
