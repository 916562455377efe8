"""robots.txt gating + per-domain politeness budget (SURVEY.md A10/A11).

Both operators broadcast their (small) policy tables — robots rules and
per-domain budgets are dimension-sized even at web scale, so neither
ever shuffles the frontier.

The budget selector is where hot-domain skew concentrates (one window
group per domain). For skewed frontiers it runs TWO phases
(SURVEY.md §4.3): a salted partial top-k per ``(domain, salt)`` cuts
each hot domain's rows to ≤ salt_buckets×budget before the exact
per-domain window runs — the exact window then sees a bounded input no
matter how hot the domain. Semantics are unchanged: phase 1 keeps a
superset of every domain's true top-budget rows (any row in the true
per-domain top-b is in the top-b of its salt bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spark_udfs import path_col

PRIORITY_COLS = ["depth", "discovered_wave", "url"]


def robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop URLs whose path matches a disallow prefix for their domain.

    JVM-only: broadcast join + higher-order EXISTS over the disallow
    array (no UDF). Unknown domains are allowed.
    """
    r = robots.select("domain", F.col("disallow").alias("_disallow"))
    path = path_col(F.col("url"))
    blocked = F.exists(
        "_disallow",
        lambda p: (F.length(p) > F.lit(0)) & F.col("_path").startswith(p),
    )
    return (
        frontier.withColumn("_path", path)
        .join(F.broadcast(r), "domain", "left")
        .withColumn("_blocked", F.coalesce(blocked, F.lit(False)))
        .filter(~F.col("_blocked"))
        .drop("_path", "_disallow", "_blocked")
    )


def budget_select(
    frontier: DataFrame,
    politeness: DataFrame,
    default_budget: int,
    salt_buckets: int = 0,
    width: int = 0,
) -> DataFrame:
    """Top-``budget(domain)`` frontier rows per domain in priority order.

    Priority = (depth asc, discovered_wave asc, url asc) — the total
    order that defines reference-equivalent crawl ordering
    (BASELINE.json:14).

    ``width > 0`` sizes the window shuffles to the FRONTIER'S row count
    instead of ``spark.sql.shuffle.partitions`` (VERDICT.md r4
    next-round #2): an explicit ``repartition(width, keys)`` satisfies
    the window's ClusteredDistribution, so EnsureRequirements inserts no
    second conf-width exchange. At bench scale the frontier is ~10^5-10^6
    rows and a 64-partition window stage was pure per-task overhead that
    GREW with the master (anti-scaling); with a data-proportional width
    both legs of an (N, 4N) pair run the same task count for the same
    rows. Selection is width-independent (row_number over a strict total
    order within each domain), pinned by the parallelism-invariance
    tests.
    """
    p = politeness.select("domain", "budget_per_wave")
    f = frontier.join(F.broadcast(p), "domain", "left").withColumn(
        "_budget",
        F.coalesce(F.col("budget_per_wave"), F.lit(default_budget)).cast("int"),
    ).drop("budget_per_wave")
    if salt_buckets and salt_buckets > 1:
        w1 = Window.partitionBy("domain", "_salt").orderBy(*PRIORITY_COLS)
        f = f.withColumn(
            "_salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
        )
        if width > 0:
            f = f.repartition(width, "domain", "_salt")
        f = (
            f.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("_budget"))
            .drop("_salt", "_r1")
        )
    if width > 0:
        f = f.repartition(width, "domain")
    w2 = Window.partitionBy("domain").orderBy(*PRIORITY_COLS)
    return (
        f.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= F.col("_budget"))
        .drop("_rk", "_budget")
    )
