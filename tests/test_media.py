"""Multimodal resize + frame-sample operators (operators/media.py).

The pipeline's arithmetic is pinned against a DuckDB oracle the same
way the driver pins the 50 registry queries: the synthetic corpus
derives every pixel from the closed form media.PIX_SQL, so DuckDB can
recompute the exact pix_sum / frame_sum the Spark mapInPandas stages
emit — value-for-value, no tolerance. The resized BYTES are pinned
against a pure-numpy reference (the oracle covers the arithmetic, the
reference covers the codec round-trip), and the plan is asserted
shuffle-free (a map stage must not move rows).
"""

from __future__ import annotations

import os
import zlib

import duckdb
import numpy as np
import pytest

from torscrapper_spark.functions import codecs
from torscrapper_spark.operators import media

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
DOCS = f"{SF_DIR}/documents.parquet"
N_DOCS = 40
W = H = 16
FACTOR = 2
NFRAMES = 8
EVERY = 3


def _docs(spark):
    return (
        spark.read.parquet(DOCS)
        .orderBy("doc_id").limit(N_DOCS).select("doc_id")
    )


# ---------- kernel ----------

def test_resize_area_matches_naive_loop():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(12, 8, 3), dtype=np.uint8)
    got = codecs.resize_area(px, 4)
    assert got.shape == (3, 2, 3) and got.dtype == np.uint8
    for oy in range(3):
        for ox in range(2):
            for c in range(3):
                block = px[oy * 4:(oy + 1) * 4, ox * 4:(ox + 1) * 4, c]
                assert got[oy, ox, c] == int(block.astype(np.int64).sum()) // 16


def test_resize_area_validation():
    px = np.zeros((8, 8, 3), np.uint8)
    assert codecs.resize_area(px, 1) is not px  # copy, not alias
    with pytest.raises(ValueError):
        codecs.resize_area(px, 3)  # 3 does not divide 8
    with pytest.raises(ValueError):
        codecs.resize_area(px.astype(np.int32), 2)


def test_synth_pixels_matches_pix_sql_formula():
    seed, frame = 4321, 5
    px = media.synth_pixels(seed, 4, 3, frame)
    for y in range(3):
        for x in range(4):
            for c in range(3):
                want = (seed * 29 + frame * 17 + x * 7 + y * 13 + c * 5) % 256
                assert int(px[y, x, c]) == want


# ---------- resize pipeline vs DuckDB oracle ----------

@pytest.mark.parametrize("fmt", ["zlib-rgb", "rgb8"])
def test_resize_pipeline_matches_duckdb_oracle(spark, fmt):
    out = (
        media.resize_images(
            media.synthesize_images(_docs(spark), W, H, fmt), FACTOR
        )
        .select("image_id", "w", "h", "pix_sum")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pix = media.PIX_SQL.format(
        seed="d.doc_id % 8191", frame="0",
        x="ox.range*2 + dx.range", y="oy.range*2 + dy.range", c="c.range",
    )
    oracle = duckdb.sql(f"""
        WITH d AS (SELECT doc_id FROM '{DOCS}' ORDER BY doc_id LIMIT {N_DOCS}),
        blocks AS (
          SELECT d.doc_id, ox.range AS ox, oy.range AS oy, c.range AS c,
                 SUM({pix}) AS bsum
          FROM d, range({W // FACTOR}) ox, range({H // FACTOR}) oy,
               range(3) c, range({FACTOR}) dx, range({FACTOR}) dy
          GROUP BY ALL
        )
        SELECT 'img-' || doc_id AS image_id,
               CAST(SUM(bsum // {FACTOR * FACTOR}) AS BIGINT) AS pix_sum
        FROM blocks GROUP BY doc_id ORDER BY image_id
    """).df().reset_index(drop=True)
    assert len(out) == N_DOCS
    assert out["image_id"].tolist() == oracle["image_id"].tolist()
    assert out["pix_sum"].tolist() == oracle["pix_sum"].tolist()
    assert (out["w"] == W // FACTOR).all() and (out["h"] == H // FACTOR).all()


def test_resize_bytes_and_phash_match_numpy_reference(spark):
    rows = {
        r["image_id"]: r
        for r in media.resize_images(
            media.synthesize_images(_docs(spark), W, H, "zlib-rgb"), FACTOR
        ).collect()
    }
    assert len(rows) == N_DOCS
    for doc_id in [0, 1, N_DOCS - 1]:
        want = codecs.resize_area(
            media.synth_pixels(doc_id % 8191, W, H), FACTOR
        )
        r = rows[f"img-{doc_id}"]
        got = codecs.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        assert np.array_equal(got, want)
        assert r["phash"] == codecs.avg_phash(want)
        assert r["caption"] == f"caption for doc {doc_id}"


# ---------- standalone feature extraction vs DuckDB oracle ----------

@pytest.mark.parametrize("fmt,max_hamming", [("zlib-rgb", 0), ("quant6", codecs.PHASH_LOSSY_HAMMING)])
def test_extract_features_matches_duckdb_oracle(spark, fmt, max_hamming):
    out = (
        media.extract_features(media.synthesize_images(_docs(spark), W, H, fmt))
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    assert len(out) == N_DOCS
    # phash drift bound: exact for lossless, Hamming-bounded for lossy
    assert (out["phash_hamming"] <= max_hamming).all(), \
        out["phash_hamming"].max()
    if max_hamming == 0:
        assert (out["phash"] == out["phash_ref"]).all()
        # lossless channel sums against the closed form
        pix = media.PIX_SQL.format(
            seed="d.doc_id % 8191", frame="0",
            x="x.range", y="y.range", c="c.col0",
        )
        oracle = duckdb.sql(f"""
            WITH d AS (SELECT doc_id FROM '{DOCS}'
                       ORDER BY doc_id LIMIT {N_DOCS})
            SELECT 'img-' || d.doc_id AS image_id,
                   CAST(SUM(CASE WHEN c.col0=0 THEN {pix} END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c.col0=1 THEN {pix} END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c.col0=2 THEN {pix} END) AS BIGINT) AS sum_b
            FROM d, range({W}) x, range({H}) y, (VALUES (0),(1),(2)) c
            GROUP BY d.doc_id ORDER BY image_id
        """).df().reset_index(drop=True)
        for col in ("sum_r", "sum_g", "sum_b"):
            assert out[col].tolist() == oracle[col].tolist(), col


def test_extract_features_plan_is_shuffle_free(spark):
    plan = (
        media.extract_features(
            media.synthesize_images(_docs(spark), W, H, "rgb8")
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    # synthesize = MapInPandas; extract_features = a MapInArrow stage
    # (nullable-int64 exactness — see the operator docstring)
    assert plan.count("MapInPandas") == 1, plan
    assert "MapInArrow" in plan, plan


# ---------- video containers (kernel) ----------

def _raw_frames(seed, n):
    return [media.synth_pixels(seed, W, H, f).tobytes() for f in range(n)]


def test_zvid_roundtrip_and_variable_stride():
    frames = _raw_frames(77, NFRAMES)
    buf = codecs.mux_video(frames, "zvid")
    # demux yields exactly the sampled frames, decompressed bit-exactly
    got = dict(codecs._demux_zvid(buf, W, H, NFRAMES, EVERY))
    assert sorted(got) == list(range(0, NFRAMES, EVERY))
    for f, raw in got.items():
        assert raw == frames[f]
    # the container is genuinely variable-stride: per-frame compressed
    # payloads differ in length (constant-stride would defeat the test)
    lens, off = [], 8
    for _ in range(NFRAMES):
        ln = int.from_bytes(buf[off:off + 4], "big")
        lens.append(ln)
        off += 4 + ln
    assert len(set(lens)) > 1, lens


def test_zvid_demux_skips_unsampled_payloads():
    # corrupt a NON-sampled frame's compressed payload in place (length
    # prefix untouched): demux must still succeed because it only
    # decompresses the sampled frames — the O(sampled) property that
    # makes frame-sampling cheap on variable-stride containers
    frames = _raw_frames(5, NFRAMES)
    buf = bytearray(codecs.mux_video(frames, "zvid"))
    off = 8
    ln0 = int.from_bytes(buf[off:off + 4], "big")
    off += 4 + ln0  # start of frame 1's length prefix
    ln1 = int.from_bytes(buf[off:off + 4], "big")
    payload = slice(off + 4, off + 4 + ln1)
    buf[payload] = bytes(ln1)  # frame 1 (unsampled at EVERY=3) is garbage
    got = dict(codecs._demux_zvid(bytes(buf), W, H, NFRAMES, EVERY))
    assert sorted(got) == list(range(0, NFRAMES, EVERY))
    assert got[0] == frames[0]
    # sampling every=1 DOES touch frame 1 and must fail loudly
    with pytest.raises(Exception):
        list(codecs._demux_zvid(bytes(buf), W, H, NFRAMES, 1))


def test_zvid_property_roundtrip_and_mutation_detection():
    # property check over random geometry/content/sampling: mux→demux
    # round-trips the sampled frames bit-exactly, and ANY byte mutation
    # either still decodes every sampled frame identically (mutation
    # landed in an unsampled payload — allowed by the O(sampled)
    # contract) or raises ValueError — the codec contract: corrupt
    # payloads surface as ValueError, never a bare zlib.error, and
    # never silently wrong pixels for a sampled frame
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        w = data.draw(st.integers(1, 6))
        h = data.draw(st.integers(1, 6))
        n = data.draw(st.integers(1, 6))
        every = data.draw(st.integers(1, 4))
        frames = [
            bytes(data.draw(st.binary(min_size=w * h * 3,
                                      max_size=w * h * 3)))
            for _ in range(n)
        ]
        buf = codecs.mux_video(frames, "zvid")
        got = dict(codecs._demux_zvid(buf, w, h, n, every))
        assert got == {f: frames[f] for f in range(0, n, every)}
        pos = data.draw(st.integers(0, len(buf) - 1))
        delta = data.draw(st.integers(1, 255))
        mut = buf[:pos] + bytes([(buf[pos] + delta) % 256]) + buf[pos + 1:]
        try:
            got_mut = dict(codecs._demux_zvid(mut, w, h, n, every))
        except ValueError:
            return
        for f in range(0, n, every):
            assert got_mut.get(f) == frames[f], (
                f"sampled frame {f} silently corrupted by byte {pos}"
            )

    run()


def test_zvid_demux_rejects_malformed():
    frames = _raw_frames(9, NFRAMES)
    buf = codecs.mux_video(frames, "zvid")
    # corrupt frame 0's payload in place: SAMPLED, so demux must fail —
    # and with ValueError (the codec contract), not a bare zlib.error
    ln0 = int.from_bytes(buf[8:12], "big")
    corrupt0 = buf[:12] + bytes(ln0) + buf[12 + ln0:]
    for bad, msg in [
        (b"XXXX" + buf[4:], "magic"),
        (buf[:4] + (NFRAMES + 1).to_bytes(4, "big") + buf[8:], "frames"),
        (buf[:-3], "truncated"),
        (buf + b"\x00", "trailing"),
        (corrupt0, "frame 0"),
    ]:
        with pytest.raises(ValueError, match=msg):
            list(codecs._demux_zvid(bad, W, H, NFRAMES, EVERY))


def test_bounded_decompress_defuses_decompression_bomb():
    stride = W * H * 3
    bomb = zlib.compress(b"\x00" * (stride * 4096), 9)  # ~3 MB → few KB
    assert len(bomb) < stride * 4096 // 100
    # image decode path
    with pytest.raises(ValueError, match="inflates"):
        codecs.decode(bomb, "zlib-rgb", W, H)
    # video demux path: well-framed container whose frame 0 is the bomb
    buf = (codecs.ZVID_MAGIC + (1).to_bytes(4, "big")
           + len(bomb).to_bytes(4, "big") + bomb)
    with pytest.raises(ValueError, match="frame 0"):
        list(codecs._demux_zvid(buf, W, H, 1, 1))
    # undersized and truncated streams are equally loud
    small = zlib.compress(b"\x00" * (stride - 1), 9)
    with pytest.raises(ValueError, match="inflates"):
        codecs.decode(small, "zlib-rgb", W, H)
    ok = zlib.compress(b"\x00" * stride, 9)
    with pytest.raises(ValueError):
        codecs.decode(ok[:-2], "zlib-rgb", W, H)


def test_extract_features_off_grid_dims_null_phash(spark):
    # a VALID 12×12 image (12 % 8 != 0) has no 8×8 avg_phash defined:
    # phash columns are NULL, channel sums still exact — the stage must
    # not crash on the reshape (dimensions are data, not config). Rows
    # built by hand: the fixture generator only makes phash-able dims.
    rows = []
    for doc_id in range(4):
        px = media.synth_pixels(doc_id % 8191, 12, 12)
        rows.append((f"img-{doc_id}", codecs.encode(px, "rgb8"), 12, 12,
                     "rgb8", f"caption for doc {doc_id}", 0))
    out = (
        media.extract_features(
            spark.createDataFrame(rows, media.MEDIA_SCHEMA)
        ).toPandas().sort_values("image_id").reset_index(drop=True)
    )
    assert len(out) == 4
    assert out["phash"].isna().all() and out["phash_hamming"].isna().all()
    for _, r in out.iterrows():
        doc_id = int(r["image_id"].split("-")[1])
        px = media.synth_pixels(doc_id % 8191, 12, 12)
        want = px.astype(np.int64).sum(axis=(0, 1))
        assert [r["sum_r"], r["sum_g"], r["sum_b"]] == want.tolist()


def test_extract_features_mixed_batch_keeps_int64_phash_exact(spark):
    # one on-grid and one off-grid image in the SAME Arrow batch: the
    # mixed int/None phash column must not coerce through float64,
    # which silently corrupts any |hash| > 2^53 — use a full-width
    # stored phash and demand bit-exact round-trip; also a NULL stored
    # phash must yield NULL ref/hamming instead of int(NaN) crashing
    big = (1 << 62) + 12345  # not representable in float64
    on = media.synth_pixels(1, 16, 16)
    off = media.synth_pixels(2, 12, 12)
    rows = [
        ("img-on", codecs.encode(on, "rgb8"), 16, 16, "rgb8", "c", big),
        ("img-off", codecs.encode(off, "rgb8"), 12, 12, "rgb8", "c", 7),
        ("img-nullref", codecs.encode(on, "rgb8"), 16, 16, "rgb8", "c",
         None),
    ]
    out = {
        r["image_id"]: r
        for r in media.extract_features(
            spark.createDataFrame(rows, media.MEDIA_SCHEMA).coalesce(1)
        ).collect()
    }
    assert out["img-on"]["phash_ref"] == big  # bit-exact, no float trip
    want_ph = codecs.avg_phash(on)
    assert out["img-on"]["phash"] == want_ph
    assert out["img-on"]["phash_hamming"] == codecs.hamming64(want_ph, big)
    assert out["img-off"]["phash"] is None
    assert out["img-off"]["phash_ref"] == 7
    assert out["img-off"]["phash_hamming"] is None
    assert out["img-nullref"]["phash"] == want_ph
    assert out["img-nullref"]["phash_ref"] is None
    assert out["img-nullref"]["phash_hamming"] is None


# ---------- frame-sample pipeline vs DuckDB oracle ----------

@pytest.mark.parametrize("fmt", ["rgb8", "zvid"])
def test_frame_sample_matches_duckdb_oracle(spark, fmt):
    out = (
        media.sample_frames(
            media.synthesize_videos(_docs(spark), W, H, NFRAMES, fmt), EVERY
        )
        .select("image_id", "frame_idx", "frame_sum")
        .toPandas()
        .sort_values(["image_id", "frame_idx"])
        .reset_index(drop=True)
    )
    pix = media.PIX_SQL.format(
        seed="d.doc_id % 8191", frame="f.range",
        x="x.range", y="y.range", c="c.range",
    )
    oracle = duckdb.sql(f"""
        WITH d AS (SELECT doc_id FROM '{DOCS}' ORDER BY doc_id LIMIT {N_DOCS})
        SELECT 'vid-' || d.doc_id AS image_id,
               CAST(f.range AS INT) AS frame_idx,
               CAST(SUM({pix}) AS BIGINT) AS frame_sum
        FROM d, range(0, {NFRAMES}, {EVERY}) f,
             range({W}) x, range({H}) y, range(3) c
        GROUP BY ALL ORDER BY image_id, frame_idx
    """).df().reset_index(drop=True)
    n_sampled = len(range(0, NFRAMES, EVERY))
    assert len(out) == N_DOCS * n_sampled
    assert out["image_id"].tolist() == oracle["image_id"].tolist()
    assert out["frame_idx"].tolist() == oracle["frame_idx"].tolist()
    assert out["frame_sum"].tolist() == oracle["frame_sum"].tolist()


def test_sampled_frame_bytes_decode_to_the_right_frame(spark):
    rows = media.sample_frames(
        media.synthesize_videos(_docs(spark), W, H, NFRAMES), EVERY
    ).filter("image_id = 'vid-3'").collect()
    assert sorted(r["frame_idx"] for r in rows) == list(range(0, NFRAMES, EVERY))
    for r in rows:
        want = media.synth_pixels(3 % 8191, W, H, r["frame_idx"])
        got = codecs.decode(bytes(r["bytes"]), "rgb8", W, H)
        assert np.array_equal(got, want)


def test_sample_frames_container_invariant(spark):
    # same videos through the fixed-stride and variable-stride
    # containers → bit-identical sampled rows (the demuxer registry
    # must be invisible downstream)
    def sampled(fmt):
        return sorted(
            (r["image_id"], r["frame_idx"], bytes(r["bytes"]),
             r["frame_sum"])
            for r in media.sample_frames(
                media.synthesize_videos(_docs(spark), W, H, NFRAMES, fmt),
                EVERY,
            ).collect()
        )

    assert sampled("rgb8") == sampled("zvid")


def test_sample_frames_rejects_unknown_container(spark):
    vids = media.synthesize_videos(_docs(spark).limit(1), W, H, NFRAMES)
    renamed = vids.selectExpr(
        "image_id", "bytes", "w", "h", "'mp4' AS fmt", "nframes"
    )
    with pytest.raises(Exception, match="container"):
        media.sample_frames(renamed, EVERY).collect()


def test_sample_frames_rejects_bad_every():
    # validated at the operator boundary, before any DataFrame is used
    for bad in (0, -1):
        with pytest.raises(ValueError, match="every"):
            media.sample_frames(None, bad)


def test_sample_frames_rejects_malformed_video(spark):
    bad = media.synthesize_videos(_docs(spark).limit(1), W, H, NFRAMES)
    truncated = bad.selectExpr(
        "image_id", "substring(bytes, 1, 10) AS bytes", "w", "h", "fmt",
        "nframes",
    )
    with pytest.raises(Exception, match="bytes"):
        media.sample_frames(truncated, EVERY).collect()


# ---------- plan shape ----------

def test_media_pipeline_plan_is_shuffle_free(spark):
    plan = (
        media.resize_images(
            media.synthesize_images(_docs(spark).repartition(4), W, H,
                                    "zlib-rgb"), FACTOR
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the one repartition above is the SOURCE's layout; the two map
    # stages themselves must not add an Exchange
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("MapInPandas") == 2, plan


def test_resize_offgrid_dims_yield_null_phash(spark):
    """A 24×24 input resized by 2 lands at 12×12 — off the 8×8 phash
    grid. Dimensions are data, not config: the row must come back with
    a NULL phash (same gate as extract_features), not kill the stage
    on a reshape error (code-review r5). pix_sum/bytes still exact."""
    out = media.resize_images(
        media.synthesize_images(_docs(spark).limit(3), 24, 24, "rgb8"), 2
    ).collect()
    assert len(out) == 3
    for r in out:
        assert (r["w"], r["h"]) == (12, 12)
        assert r["phash"] is None
        want = codecs.resize_area(
            media.synth_pixels(int(r["image_id"][4:]) % 8191, 24, 24), 2
        )
        assert r["pix_sum"] == int(want.sum(dtype=np.int64))
        assert bytes(r["bytes"]) == codecs.encode(want, "rgb8")


def test_resize_error_carries_image_id(spark):
    """One corrupt payload among many must fail WITH row identity —
    an unattributed worker ValueError at scale costs a bisection
    re-run (code-review r5)."""
    from pyspark.sql import functions as F

    imgs = media.synthesize_images(_docs(spark).limit(3), W, H, "zlib-rgb")
    corrupt = imgs.withColumn(
        "bytes",
        F.when(F.col("image_id") == "img-1",
               F.lit(b"\x00not-zlib")).otherwise(F.col("bytes")),
    )
    with pytest.raises(Exception, match="image img-1"):
        media.resize_images(corrupt, FACTOR).collect()
