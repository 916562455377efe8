"""Scalable deterministic global sequence numbers (SURVEY.md A20).

A naive ``row_number().over(Window.orderBy(...))`` funnels the whole
DataFrame through ONE task — fine at politeness-bounded wave sizes,
fatal at 10^10-frontier scale. This operator assigns a total-order
sequence in parallel:

  1. range-repartition + sort-within-partitions on the order columns
  2. count rows per partition (tiny: P rows to the driver)
  3. broadcast-join cumulative offsets back; seq = offset + intra-
     partition row_number (each window group == one range partition,
     so the window itself is embarrassingly parallel)

The result is independent of where the range partitioner places its
boundaries as long as the order columns form a strict total order
(callers include ``url``, unique per wave), so seq values are
deterministic across parallelism levels — the property BASELINE.md's
two-cluster-size protocol checks (bit-identical traces at local[8] and
local[32]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    d1 = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in d1.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    if not offsets:
        # empty input: release the (empty) cache registered above and
        # still honor the documented contract — callers unpersist
        # `_seq_cache` after materializing, so it must exist on every
        # return path
        d1.unpersist()
        out = df.withColumn(out_col, F.lit(None).cast("long")).limit(0)
        out._seq_cache = d1  # type: ignore[attr-defined]
        return out
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        d1.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_off") + F.row_number().over(w))
        .drop("_pid", "_off")
    )
    # expose the internal cache so the wave loop can release it after the
    # trace write (persist/unpersist lifetime is one wave)
    out._seq_cache = d1  # type: ignore[attr-defined]
    return out
