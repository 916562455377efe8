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


def test_hostile_dimensions_invalidate_rows_not_task(spark, tiny_tables):
    """Dimensions are untrusted data: negative, zero, or absurd (h, w)
    must mark the ROWS invalid without killing the task — np.zeros on a
    negative or multi-GB scratch shape would die before any per-row
    decode try could fire."""
    pdf = _rows(tiny_tables, 5)
    pdf.loc[pdf.index[0], ["w", "h"]] = [-8, 8]
    pdf.loc[pdf.index[1], ["w", "h"]] = [0, 0]
    pdf.loc[pdf.index[2], ["w", "h"]] = [1 << 16, 1 << 16]  # 4 TB scratch
    # over the byte-cap-derived pixel ceiling but under the old 2^24
    # standalone one: at chunk floor 1 this would pin ~436 MB of
    # scratch (26·h·w), 3.4× the stated 128 MB per-entry cap
    pdf.loc[pdf.index[3], ["w", "h"]] = [4096, 4095]
    out = _validate(spark, pdf).sort_values("url_hash").reset_index(drop=True)
    assert not out.loc[0, "valid"] and not out.loc[0, "decode_ok"]
    assert not out.loc[1, "valid"] and not out.loc[1, "decode_ok"]
    assert not out.loc[2, "valid"] and not out.loc[2, "decode_ok"]
    assert not out.loc[3, "valid"] and not out.loc[3, "decode_ok"]
    assert out.loc[4, "valid"]  # the clean row in the same batch


def test_scratch_chunk_shrinks_for_large_images():
    """The per-(h, w) scratch entry is byte-capped: large images shrink
    the chunk (floor 1) instead of pinning 26·64·h·w bytes, and
    off-grid entries skip the phash-only gray3 buffer."""
    from torscrapper_spark.operators import fetch as FT

    FT._SCRATCH.clear()
    small = FT._bufs(16, 16, True)
    assert small["a"].shape[0] == FT._CHUNK and "gray3" in small
    big = FT._bufs(2048, 2048, True)
    assert big["a"].shape[0] == 1  # 26·64·2048² would be ~7 GB
    offgrid = FT._bufs(12, 12, False)
    assert "gray3" not in offgrid
    FT._SCRATCH.clear()
    # the cap must hold at the chunk floor too: the dims gate's pixel
    # ceiling is derived from the byte cap, so no admissible (h, w) can
    # allocate an over-cap entry even at chunk 1
    assert 26 * FT._MAX_PIXELS <= FT._SCRATCH_ENTRY_BYTES


def test_fetch_join_status_matches_refsim_on_half_null_rows(spark):
    """The hit/miss rule is the refsim's exact one — status 200 iff the
    store row's html is non-null: a present row with NULL html must
    trace 404 (the simulator's pages.get returns None), and a NULL
    image_id with html present must trace 200. Keying status on any
    other nullable payload column silently diverges the trace."""
    from torscrapper_spark.operators.fetch import fetch_join

    store = spark.createDataFrame(
        pd.DataFrame({
            "url": ["http://a.onion/1", "http://a.onion/2"],
            "url_hash": pd.Series([1, 2], dtype="int64"),
            "image_id": ["img-1", None],
            "bytes": [b"", b""],
            "w": pd.Series([8, 8], dtype="int32"),
            "h": pd.Series([8, 8], dtype="int32"),
            "fmt": ["rgb8", "rgb8"],
            "caption": ["c", "c"],
            "ref_caption": ["c", "c"],
            "phash": pd.Series([0, 0], dtype="int64"),
            "ref_bytes": [b"", b""],
            "html": [None, "<a href='x'></a>"],
        })
    )
    wave = spark.createDataFrame(
        pd.DataFrame({
            "url": ["http://a.onion/1", "http://a.onion/2",
                    "http://a.onion/3"],
            "url_hash": pd.Series([1, 2, 3], dtype="int64"),
            "domain": ["a.onion"] * 3,
            "depth": pd.Series([0, 0, 0], dtype="int32"),
            "discovered_wave": pd.Series([0, 0, 0], dtype="int32"),
        })
    )
    out = fetch_join(wave, store).select("url_hash", "status").toPandas()
    status = dict(zip(out["url_hash"], out["status"]))
    assert status == {1: 404,   # present but html NULL — refsim says 404
                      2: 200,   # image_id NULL but html present — 200
                      3: 404}   # true miss
