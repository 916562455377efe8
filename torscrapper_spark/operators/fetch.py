"""Batched fetch wave + image decode/validate (SURVEY.md A13/A14/A15).

In the sandbox, "the network" is the deterministic synthetic pagestore,
so a fetch wave is one DataFrame join: the politeness-bounded wave
(small) against the pagestore (huge). AQE broadcasts the wave side; on
a real deployment the pagestore is written partitioned by
``bucket = pmod(xxhash64(url), NB)`` and the join carries the bucket
equality so dynamic partition pruning skips every bucket the wave does
not touch (see ``plans/crawl.py::load_pagestore``). A production
network fetcher drops in as a ``mapInPandas`` stage with the same
output schema.

Validation implements the per-row invariant of BASELINE.json:15 in one
Arrow-batched ``mapInPandas`` pass: decode bytes per ``fmt``, PSNR vs
the reference pixels (≥40 dB for lossy fmts, bit-exact for lossless),
recomputed perceptual hash vs the stored ``phash``, and exact caption
equality.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import (
    LOSSY_FMTS,
    PHASH_LOSSY_HAMMING,
    avg_phash,
    decode,
    hamming64,
    psnr,
)

FETCH_COLS = [
    "url", "url_hash", "domain", "depth", "discovered_wave",
    "status", "image_id", "bytes", "w", "h", "fmt",
    "caption", "ref_caption", "phash", "ref_bytes", "html",
]

VALIDATED_SCHEMA = (
    "url string, url_hash long, domain string, depth int, discovered_wave int, "
    "status int, image_id string, caption string, fmt string, w int, h int, "
    "n_bytes long, decode_ok boolean, psnr double, psnr_ok boolean, "
    "phash_match boolean, caption_ok boolean, valid boolean, html string"
)


def fetch_join(selected: DataFrame, pagestore: DataFrame) -> DataFrame:
    """One fetch wave = selected ⋈ pagestore; misses become status 404.

    Join shape matters enormously here: a naive ``selected LEFT JOIN
    pagestore`` cannot broadcast its small (politeness-bounded) side, so
    Spark shuffles the entire image store every wave. Instead:

      hits   = pagestore ⋈ BROADCAST(selected)   (inner — store is only
               SCANNED, never shuffled; with a bucketed store the bucket
               key also prunes partitions)
      misses = selected ∖ hits                   (broadcast anti-join)

    At 10^10 scale with waves too large to broadcast, the equivalent is
    a bucket-wise co-partitioned join against the bucketed store; in
    production the whole operator is replaced by a mapInPandas network
    fetcher with this same output schema.
    """
    join_keys = ["url_hash", "url"]
    if "bucket" in pagestore.columns and "bucket" in selected.columns:
        join_keys = ["bucket", *join_keys]
    hits = pagestore.join(F.broadcast(selected), join_keys, "inner")
    # 404s: anti-join against the store's KEY columns (column-pruned
    # scan — never re-reads the payload; deriving misses from `hits`
    # would scan the full store a second time)
    misses = selected.join(
        F.broadcast(pagestore.select(*join_keys)), join_keys, "left_anti"
    )
    payload_cols = {
        "image_id": "string", "bytes": "binary", "w": "int", "h": "int",
        "fmt": "string", "caption": "string", "ref_caption": "string",
        "phash": "long", "ref_bytes": "binary", "html": "string",
    }
    for c, typ in payload_cols.items():
        misses = misses.withColumn(c, F.lit(None).cast(typ))
    fetched = hits.unionByName(misses.select(*hits.columns))
    # 404 rows leave the numeric payload columns NULL; a nullable int64
    # becomes float64 on the Arrow→pandas hop and silently loses
    # precision above 2^53 (observed as corrupted phash values), so pin
    # them to 0 — status 404 already marks the row invalid.
    return (
        fetched.withColumn(
            "status",
            F.when(F.col("image_id").isNull(), F.lit(404)).otherwise(F.lit(200)),
        )
        .withColumn("phash", F.coalesce(F.col("phash"), F.lit(0)))
        .withColumn("w", F.coalesce(F.col("w"), F.lit(0)))
        .withColumn("h", F.coalesce(F.col("h"), F.lit(0)))
        .select(*FETCH_COLS)
    )


def decode_validate(fetched: DataFrame) -> DataFrame:
    """Arrow-batched decode + PSNR/phash/caption validation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_bytes = [0] * n
            decode_ok = [False] * n
            psnr_v = [float("nan")] * n
            psnr_ok = [False] * n
            phash_match = [False] * n
            caption_ok = [False] * n
            for i in range(n):
                if pdf["status"].iat[i] != 200:
                    continue
                data = pdf["bytes"].iat[i]
                fmt = pdf["fmt"].iat[i]
                w, h = int(pdf["w"].iat[i]), int(pdf["h"].iat[i])
                n_bytes[i] = len(data) if data is not None else 0
                try:
                    px = decode(bytes(data), fmt, w, h)
                    decode_ok[i] = True
                except Exception:
                    continue
                ref = decode(bytes(pdf["ref_bytes"].iat[i]), "zlib-rgb", w, h)
                p = psnr(px, ref)
                psnr_v[i] = p if math.isfinite(p) else 99.0
                psnr_ok[i] = (p >= 40.0) if fmt in LOSSY_FMTS else (p == float("inf"))
                dist = hamming64(avg_phash(px), int(pdf["phash"].iat[i]))
                phash_match[i] = dist <= (
                    PHASH_LOSSY_HAMMING if fmt in LOSSY_FMTS else 0
                )
                caption_ok[i] = pdf["caption"].iat[i] == pdf["ref_caption"].iat[i]
            out = pdf[[
                "url", "url_hash", "domain", "depth", "discovered_wave",
                "status", "image_id", "caption", "fmt", "w", "h", "html",
            ]].copy()
            out["n_bytes"] = pd.Series(n_bytes, index=pdf.index, dtype="int64")
            out["decode_ok"] = decode_ok
            out["psnr"] = psnr_v
            out["psnr_ok"] = psnr_ok
            out["phash_match"] = phash_match
            out["caption_ok"] = caption_ok
            out["valid"] = (
                out["decode_ok"] & out["psnr_ok"]
                & out["phash_match"] & out["caption_ok"]
            )
            yield out[[
                "url", "url_hash", "domain", "depth", "discovered_wave",
                "status", "image_id", "caption", "fmt", "w", "h",
                "n_bytes", "decode_ok", "psnr", "psnr_ok",
                "phash_match", "caption_ok", "valid", "html",
            ]]

    return fetched.mapInPandas(run, VALIDATED_SCHEMA)
