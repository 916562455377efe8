"""Vectorized pandas UDFs wrapping the pure kernels (Arrow-batched).

These are the ONLY places engine Python touches row data, per the
input_hint mandate ("vectorized pandas/Arrow UDFs (no per-row Python)",
BASELINE.json:15). Everything else stays in JVM whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .urls import _DOMAIN_RE, canonicalize_series, extract_links_series

canonicalize_udf = F.pandas_udf(canonicalize_series, T.StringType())

extract_links_udf = F.pandas_udf(extract_links_series, T.ArrayType(T.StringType()))


def url_hash_col(url_col: str | Column) -> Column:
    """64-bit key of a canonical URL — built-in xxhash64, no UDF."""
    return F.xxhash64(url_col)


def domain_col(url_col: str | Column) -> Column:
    """Host of a canonical URL — JVM-side regexp, no UDF. The pattern
    IS urls._DOMAIN_RE (one source of truth with the refsim's
    domain_series — a drifted copy here would silently diverge engine
    vs reference crawl ordering; code-review r5)."""
    return F.regexp_extract(url_col, _DOMAIN_RE, 1)


def path_col(url_col: str | Column) -> Column:
    """Path(+query) of a canonical URL; '/' when absent. JVM-side.

    ``(?s)`` (DOTALL) keeps this bit-equivalent to the refsim's
    ``urls.path_of`` string slice on hostile inputs: HREF_RE's
    ``[^"]+`` and the canonicalizer's ``[^?#]*`` both pass an embedded
    newline through, and without DOTALL the Java ``.*`` cannot cross
    it — the whole match failed, the path degraded to "/", and a
    disallow prefix the refsim enforced was silently bypassed."""
    p = F.regexp_extract(
        url_col, r"(?s)^[a-z][a-z0-9+.\-]*://[^/?#]+([/?].*)?$", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)
