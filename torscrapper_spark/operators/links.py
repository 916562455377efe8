"""Link extraction → canonicalize → in-wave dedup (SURVEY.md A16/A9).

Extraction is a vectorized-regex pandas UDF (no bs4 in the sandbox;
the UDF sits behind this function so a real HTML parser can replace it
on a cluster). In-wave dedup is a ``groupBy(url).min(depth)`` — an
order-independent aggregate with map-side partial aggregation, chosen
over a window keep-first precisely so the result cannot depend on task
scheduling (SURVEY.md §4.3 "deterministic crawl order").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_udfs import (
    canonicalize_udf,
    domain_col,
    extract_links_udf,
    url_hash_col,
)


def extract_candidates(fetched_ok: DataFrame, next_wave: int) -> DataFrame:
    """(url, url_hash, domain, depth, discovered_wave) candidates from html.

    Input: validated fetch rows with status 200 (columns html, depth).
    Output is deduped per canonical URL keeping MIN depth.
    """
    exploded = (
        fetched_ok.select(
            (F.col("depth") + 1).alias("depth"),
            F.explode(extract_links_udf(F.col("html"))).alias("href"),
        )
    )
    canon = exploded.select(
        canonicalize_udf(F.col("href")).alias("url"), "depth"
    )
    dedup = canon.groupBy("url").agg(F.min("depth").alias("depth"))
    return dedup.select(
        "url",
        url_hash_col("url").alias("url_hash"),
        domain_col("url").alias("domain"),
        F.col("depth").cast("int").alias("depth"),
        F.lit(next_wave).cast("int").alias("discovered_wave"),
    )
