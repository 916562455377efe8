"""Multimodal column operators: decode → resize and video frame-sample.

The build brief's multimodal family is decode / feature-extract /
resize / frame-sample over opaque ``binary`` columns with typed
metadata. Decode + feature-extract (PSNR gate, perceptual hash,
caption equality) live on the crawl's hot path
(``operators/fetch.py``); this module adds the remaining two as
standalone table transforms over the input-hint row shape
``(image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long)``.

100-TB posture: every operator here is a pure map stage
(``mapInPandas``, or ``mapInArrow`` where nullable int64 exactness
demands it — see :func:`extract_features`) — no shuffle, no driver
collect, no per-row Python in the arithmetic (the codec registry's
zlib/numpy calls are per-image C calls, the same granularity any image
codec has). Payload crosses the
JVM↔Python boundary once per stage; Arrow batch size (and therefore
per-worker peak memory ≈ batch_rows × image_bytes) is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning is
whatever the source table provides — a media table bucketed by
``image_id`` stays bucketed through the stage because a map never
moves rows.

Determinism: all pixel arithmetic is exact-integer
(:func:`~torscrapper_spark.functions.codecs.resize_area`,
:func:`~torscrapper_spark.functions.codecs.avg_phash`), so outputs are
bit-identical across parallelism levels and batch boundaries — the
same invariance the crawl's two-cluster-size protocol pins.

The synthetic generators (:func:`synthesize_images`,
:func:`synthesize_videos`) exist because the sandbox has no media
corpus: they derive every pixel from a CLOSED-FORM formula
(:data:`PIX_SQL`) that ANSI SQL can recompute, so tests/test_media.py
verifies the whole decode→resize→stats pipeline against a DuckDB
oracle value-for-value — the same evidence class as the driver's
oracled queries, without consuming one of the 50 capped registry
slots. On a real cluster the generators are dropped and the transforms
read an existing media table unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs

MEDIA_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)
RESIZED_SCHEMA = MEDIA_SCHEMA + ", pix_sum long"
FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "phash long, phash_ref long, phash_hamming int, "
    "sum_r long, sum_g long, sum_b long"
)
VIDEO_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, nframes int"
FRAME_SCHEMA = (
    "image_id string, frame_idx int, bytes binary, w int, h int, "
    "fmt string, frame_sum long"
)

# one pixel of the synthetic corpus, as a SQL expression template over
# (seed, frame, x, y, c) — the single source of truth the numpy
# generator below and the DuckDB oracle in tests/test_media.py both
# instantiate. seed = doc_id % 8191 keeps every intermediate far below
# int64 overflow on both engines; doc_id must be non-negative (Python
# and SQL % disagree on negatives).
PIX_SQL = "(({seed})*29 + ({frame})*17 + ({x})*7 + ({y})*13 + ({c})*5) % 256"


def synth_pixels(seed: int, w: int, h: int, frame: int = 0) -> np.ndarray:
    """(h, w, 3) uint8 image: the numpy instantiation of :data:`PIX_SQL`."""
    x = np.arange(w, dtype=np.int64) * 7
    y = np.arange(h, dtype=np.int64) * 13
    c = np.arange(3, dtype=np.int64) * 5
    base = int(seed) * 29 + int(frame) * 17
    return (
        (base + y[:, None, None] + x[None, :, None] + c[None, None, :]) % 256
    ).astype(np.uint8)


def _seed(doc_id: int) -> int:
    return int(doc_id) % 8191


def synthesize_images(
    docs: DataFrame, w: int = 16, h: int = 16, fmt: str = "zlib-rgb"
) -> DataFrame:
    """documents(doc_id) → media rows in the input-hint shape.

    Test-fixture generator (see module docstring); a map stage so the
    synthesized table inherits the documents table's partitioning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].astype("int64"):
                px = synth_pixels(_seed(doc_id), w, h)
                rows.append((
                    f"img-{int(doc_id)}", codecs.encode(px, fmt), w, h, fmt,
                    f"caption for doc {int(doc_id)}", codecs.avg_phash(px),
                ))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash"],
            )

    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Standalone decode → feature-extract over a media table.

    The crawl's hot path fuses feature extraction into its validator
    (``operators/fetch.py``); this is the same arithmetic as a
    table-level transform for pipelines that need features WITHOUT a
    crawl — per image: the recomputed perceptual hash, its Hamming
    distance to the stored ``phash`` (0 for lossless fmts, ≤
    :data:`codecs.PHASH_LOSSY_HAMMING` for lossy — the dedup/drift
    signal), and exact int64 per-channel pixel sums (the closed-form
    quantity the DuckDB oracle recomputes; also the cheap brightness
    feature a quality gate thresholds on). Shuffle-free map stage —
    ``mapInArrow`` rather than ``mapInPandas``, deliberately: the
    stored ``phash`` is a full-width int64 that may be NULL, and the
    Arrow→pandas conversion coerces a nullable long column through
    float64, silently corrupting any \\|hash\\| > 2^53; Arrow batches
    round-trip nullable int64 exactly in both directions. The caption
    column is carried so downstream joins need no re-fetch.

    Dimensions are data, not config (same posture as the hot-path
    validator, operators/fetch.py): a valid image whose w/h are not
    multiples of 8 has no avg_phash defined, so its phash columns are
    NULL (sums still computed) instead of crashing the stage on the
    8×8 reshape; NULL stored phash ⇒ NULL ref/hamming; a payload that
    fails to DECODE raises ValueError with the image_id attached.
    """
    import pyarrow as pa

    out_schema = pa.schema([
        ("image_id", pa.string()), ("w", pa.int32()), ("h", pa.int32()),
        ("fmt", pa.string()), ("caption", pa.string()),
        ("phash", pa.int64()), ("phash_ref", pa.int64()),
        ("phash_hamming", pa.int32()),
        ("sum_r", pa.int64()), ("sum_g", pa.int64()), ("sum_b", pa.int64()),
    ])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols: dict[str, list] = {f.name: [] for f in out_schema}
            for r in b.to_pylist():  # exact Python values, NULL → None
                try:
                    w, h = int(r["w"]), int(r["h"])
                    px = codecs.decode(bytes(r["bytes"]), r["fmt"], w, h)
                except (ValueError, TypeError) as e:
                    raise ValueError(f"image {r['image_id']}: {e}") from e
                ref = r["phash"]
                if h % 8 == 0 and w % 8 == 0 and h and w:
                    ph = codecs.avg_phash(px)
                    hamming = None if ref is None else codecs.hamming64(ph, ref)
                else:
                    ph = hamming = None
                sums = px.astype(np.int64).sum(axis=(0, 1))
                for name, v in zip(cols, (
                    r["image_id"], w, h, r["fmt"], r["caption"],
                    ph, ref, hamming,
                    int(sums[0]), int(sums[1]), int(sums[2]),
                )):
                    cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], type=f.type) for f in out_schema],
                schema=out_schema,
            )

    return media.mapInArrow(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Decode → area-average downsample by ``factor`` → re-encode.

    Output keeps the input-hint shape (bytes/w/h/fmt updated, phash
    recomputed on the resized pixels, caption carried) plus ``pix_sum``
    — the exact int64 sum of every resized pixel value, the quantity
    the DuckDB oracle recomputes in closed form. Lossless formats
    round-trip bit-exactly; lossy formats re-quantize the RESIZED
    pixels (pix_sum and phash are computed before the re-encode, on
    the exact resized array). Resized dims off the 8×8 phash grid
    yield a NULL phash (dimensions are data, not config); per-row
    decode/resize/encode failures raise with the image_id attached.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # row identity rides every re-raise, same as
                # extract_features/sample_frames — an unattributed
                # worker ValueError at scale costs a bisection re-run
                # (code-review r5)
                try:
                    px = codecs.decode(
                        bytes(r.bytes), r.fmt, int(r.w), int(r.h)
                    )
                    small = codecs.resize_area(px, factor)
                    enc = codecs.encode(small, r.fmt)
                except (ValueError, TypeError) as e:
                    raise ValueError(f"image {r.image_id}: {e}") from e
                sh, sw = small.shape[:2]
                # dimensions are data, not config: resized dims off the
                # 8×8 phash grid yield a NULL phash (mirroring
                # extract_features' gate), not a stage-killing reshape
                # error (code-review r5)
                ph = (
                    codecs.avg_phash(small)
                    if sh and sw and sh % 8 == 0 and sw % 8 == 0
                    else None
                )
                rows.append((
                    r.image_id, enc,
                    int(r.w) // factor, int(r.h) // factor, r.fmt,
                    r.caption, ph,
                    int(small.sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash", "pix_sum"],
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def synthesize_videos(
    docs: DataFrame, w: int = 16, h: int = 16, nframes: int = 8,
    fmt: str = "rgb8",
) -> DataFrame:
    """documents(doc_id) → video rows: ``nframes`` frames (frame f =
    :data:`PIX_SQL` at that f) muxed into one opaque binary in ``fmt``
    (any :data:`codecs.VIDEO_FMTS` container — ``rgb8`` fixed-stride or
    ``zvid`` variable-stride), with typed metadata. Test-fixture
    generator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].astype("int64"):
                frames = codecs.mux_video(
                    [codecs.encode(synth_pixels(_seed(doc_id), w, h, f),
                                   "rgb8")
                     for f in range(nframes)],
                    fmt,
                )
                rows.append((f"vid-{int(doc_id)}", frames, w, h, fmt,
                             nframes))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt",
                               "nframes"],
            )

    return docs.select("doc_id").mapInPandas(run, VIDEO_SCHEMA)


def sample_frames(videos: DataFrame, every: int = 3) -> DataFrame:
    """Frame-sample: emit every ``every``-th frame of each video as its
    own image row (frame 0 always included), with ``frame_sum`` — the
    exact int64 pixel sum of that frame — for the oracle check.

    A row-expanding map stage (one input video → ⌈nframes/every⌉
    frames): still shuffle-free, and output size is input size ×
    (sampled/total) — at 100 TB the sampled frames are the SMALL side,
    which is the point of sampling before any shuffle-bearing
    downstream op touches them. Containers are dispatched through
    :data:`codecs.VIDEO_DEMUXERS` — fixed-stride ``rgb8`` seeks
    straight to the sampled frames, variable-stride ``zvid`` walks the
    length prefixes but decompresses only the sampled frames; output
    frames are always raw ``rgb8`` regardless of the input container.
    A real cluster extends the registry with a true demuxer (pyav
    etc.) — the operator is container-agnostic by construction.
    """
    if every < 1:
        # validate at the operator boundary: every=0 would die as an
        # opaque range() error inside a Python worker, and a negative
        # value would silently emit zero frames from every video
        raise ValueError(f"every must be >= 1, got {every}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                demux = codecs.VIDEO_DEMUXERS.get(r.fmt)
                if demux is None:
                    raise ValueError(
                        f"sample_frames: unknown container {r.fmt!r} "
                        f"(registered: {codecs.VIDEO_FMTS})"
                    )
                w, h, n = int(r.w), int(r.h), int(r.nframes)
                try:
                    frames = list(demux(bytes(r.bytes), w, h, n, every))
                except ValueError as e:
                    raise ValueError(f"video {r.image_id}: {e}") from e
                for f, frame in frames:
                    px = np.frombuffer(frame, dtype=np.uint8)
                    rows.append((r.image_id, f, frame, w, h, "rgb8",
                                 int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(
                rows, columns=["image_id", "frame_idx", "bytes", "w", "h",
                               "fmt", "frame_sum"],
            )

    return videos.mapInPandas(run, FRAME_SCHEMA)
