"""Negative tests for the decode/validate operator: corrupted payloads
must be flagged, not silently passed (BASELINE.json:15 invariants)."""

import pandas as pd
from pyspark.sql import functions as F

from torscrapper_spark.functions.codecs import encode
from torscrapper_spark.operators.fetch import FETCH_COLS, decode_validate


def _rows(tiny_tables, n=8):
    ps = tiny_tables["pagestore"].head(n).copy()
    ps["url_hash"] = range(n)
    ps["depth"] = 0
    ps["discovered_wave"] = 0
    ps["domain"] = "d.onion"
    ps["status"] = 200
    return ps


def _validate(spark, pdf):
    sdf = spark.createDataFrame(
        pdf[FETCH_COLS],
        "url string, url_hash long, domain string, depth int, discovered_wave int, "
        "status int, image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, ref_caption string, phash long, ref_bytes binary, html string",
    )
    return decode_validate(sdf).toPandas()

def test_clean_rows_all_valid(spark, tiny_tables):
    out = _validate(spark, _rows(tiny_tables))
    assert out["valid"].all()
    assert out["decode_ok"].all() and out["caption_ok"].all() and out["phash_match"].all()


def test_corrupted_caption_flagged(spark, tiny_tables):
    pdf = _rows(tiny_tables)
    pdf.loc[pdf.index[0], "caption"] = "tampered"
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert not out.loc[0, "caption_ok"] and not out.loc[0, "valid"]
    assert out.loc[1:, "valid"].all()


def test_corrupted_pixels_fail_psnr(spark, tiny_tables):
    import numpy as np

    pdf = _rows(tiny_tables)
    i = pdf.index[0]
    w, h = int(pdf.loc[i, "w"]), int(pdf.loc[i, "h"])
    rng = np.random.default_rng(0)
    other = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    pdf.loc[i, "bytes"] = encode(other, pdf.loc[i, "fmt"])
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert out.loc[0, "decode_ok"]          # decodes fine…
    assert not out.loc[0, "psnr_ok"]        # …but fails the reference compare
    assert not out.loc[0, "valid"]


def test_truncated_bytes_fail_decode(spark, tiny_tables):
    pdf = _rows(tiny_tables)
    i = pdf.index[0]
    pdf.loc[i, "bytes"] = bytes(pdf.loc[i, "bytes"])[:7]
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert not out.loc[0, "decode_ok"] and not out.loc[0, "valid"]


def test_missing_page_is_404_not_crash(spark, tiny_tables):
    pdf = _rows(tiny_tables, 2)
    i = pdf.index[0]
    pdf.loc[i, "status"] = 404
    for c in ["bytes", "ref_bytes", "image_id", "caption", "ref_caption", "fmt", "html"]:
        pdf.loc[i, c] = None
    pdf.loc[i, ["w", "h", "phash"]] = 0
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert out.loc[0, "status"] == 404 and not out.loc[0, "valid"]
    assert out.loc[1, "valid"]


def test_null_ref_bytes_invalidates_row_not_task(spark, tiny_tables):
    """A hostile/real fetcher can emit status-200 rows whose REFERENCE
    side is missing or corrupt; both decodes sit inside the per-row try
    so the row is invalidated instead of the mapInPandas task dying."""
    pdf = _rows(tiny_tables)
    i = pdf.index[0]
    pdf.loc[i, "ref_bytes"] = None  # status stays 200
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert not out.loc[0, "decode_ok"] and not out.loc[0, "valid"]
    assert out.loc[1:, "valid"].all()


def test_offgrid_dimensions_fail_phash_not_task(spark, tiny_tables):
    """avg_phash's precondition is h, w multiples of 8; fetched
    dimensions are untrusted, so an off-grid size must fail the phash
    GATE (row invalid) rather than crash the batched reshape."""
    import numpy as np

    pdf = _rows(tiny_tables, 2)
    i = pdf.index[0]
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    pdf.loc[i, "bytes"] = encode(px, "zlib-rgb")
    pdf.loc[i, "ref_bytes"] = encode(px, "zlib-rgb")
    pdf.loc[i, "fmt"] = "zlib-rgb"
    pdf.loc[i, ["w", "h"]] = 12
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert out.loc[0, "decode_ok"] and out.loc[0, "psnr_ok"]
    assert not out.loc[0, "phash_match"] and not out.loc[0, "valid"]
    assert out.loc[1, "valid"]
