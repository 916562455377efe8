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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import LOSSY_FMTS, PHASH_LOSSY_HAMMING, decode

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


def _validate_group(
    pdf: pd.DataFrame, rows: np.ndarray, fmt: str, w: int, h: int, out: dict
) -> None:
    """Validate all batch rows sharing (fmt, w, h) with stacked-array math.

    Codec decode is one C call (zlib) per image — the per-image unit is
    inherent to the wire format, exactly like a JPEG decoder; everything
    downstream (PSNR, perceptual hash, Hamming distance) runs once over
    the stacked (n, h, w, 3) array, not per row.
    """
    byte_vals = pdf["bytes"].to_numpy()
    ref_vals = pdf["ref_bytes"].to_numpy()
    good, imgs = [], []
    for i in rows:
        try:
            imgs.append(decode(bytes(byte_vals[i]), fmt, w, h))
            good.append(i)
        except Exception:
            continue
    if not good:
        return
    good = np.asarray(good)
    a = np.stack(imgs)                                     # (n, h, w, 3) uint8
    r = np.stack([decode(bytes(ref_vals[i]), "zlib-rgb", w, h) for i in good])
    out["decode_ok"][good] = True

    diff = a.astype(np.int32) - r.astype(np.int32)
    mse = np.einsum("nhwc,nhwc->n", diff, diff, dtype=np.float64) / diff[0].size
    lossy = fmt in LOSSY_FMTS
    with np.errstate(divide="ignore"):
        p = 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)  # inf where mse == 0
    out["psnr"][good] = np.where(mse == 0.0, 99.0, p)
    out["psnr_ok"][good] = (p >= 40.0) if lossy else (mse == 0.0)

    # batched avg_phash: 8×8 block means vs per-image mean (codecs.avg_phash)
    gray = a.astype(np.float64).mean(axis=3)
    blocks = gray.reshape(len(good), 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2), keepdims=True)
    packed = np.packbits(bits.reshape(len(good), 64), axis=1)
    ph = packed.view(">u8")[:, 0].astype(np.uint64)
    stored = pdf["phash"].to_numpy()[good].astype(np.int64).view(np.uint64)
    xor_bytes = np.frombuffer((ph ^ stored).tobytes(), dtype=np.uint8)
    dist = np.unpackbits(xor_bytes).reshape(len(good), 64).sum(axis=1)
    out["phash_match"][good] = dist <= (PHASH_LOSSY_HAMMING if lossy else 0)


def decode_validate(fetched: DataFrame) -> DataFrame:
    """Arrow-batched decode + PSNR/phash/caption validation (no per-row
    Python: rows are grouped by (fmt, w, h) and validated as stacked
    numpy arrays; see :func:`_validate_group`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            status = pdf["status"].to_numpy()
            ok = status == 200
            out_cols = {
                "decode_ok": np.zeros(n, dtype=bool),
                "psnr": np.full(n, float("nan")),
                "psnr_ok": np.zeros(n, dtype=bool),
                "phash_match": np.zeros(n, dtype=bool),
            }
            n_bytes = np.zeros(n, dtype=np.int64)
            if ok.any():
                n_bytes[ok] = [len(b) for b in pdf["bytes"].to_numpy()[ok]]
                keys = pd.DataFrame({
                    "fmt": pdf["fmt"].to_numpy(), "w": pdf["w"].to_numpy(),
                    "h": pdf["h"].to_numpy(), "_i": np.arange(n),
                })[ok]
                for (fmt, w, h), grp in keys.groupby(
                    ["fmt", "w", "h"], sort=False
                ):
                    _validate_group(
                        pdf, grp["_i"].to_numpy(), str(fmt), int(w), int(h),
                        out_cols,
                    )
            caption_ok = (
                ok & (pdf["caption"] == pdf["ref_caption"]).fillna(False).to_numpy()
            )
            out = pdf[[
                "url", "url_hash", "domain", "depth", "discovered_wave",
                "status", "image_id", "caption", "fmt", "w", "h", "html",
            ]].copy()
            out["n_bytes"] = n_bytes
            out["decode_ok"] = out_cols["decode_ok"]
            out["psnr"] = out_cols["psnr"]
            out["psnr_ok"] = out_cols["psnr_ok"]
            out["phash_match"] = out_cols["phash_match"]
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
