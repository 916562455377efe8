"""Micro-benchmark: what delta compaction buys a long-running crawl.

The `seen` table is a delta chain — one dir per wave — and every wave's
residual dup-check reads the WHOLE chain (`read_upto`). Uncompacted,
that read pays O(waves) directory listings + parquet footer opens per
wave, a fixed cost that grows with crawl age while carrying the same
bytes; `SnapshotStore.compact` folds the chain into one base dir so the
cost goes back to O(1 + deltas-since-base). This script measures that
directly: build a store with W delta versions of identical total rows,
time `read_upto(...).count()` (a) uncompacted at several chain lengths
and (b) compacted, and publish the JSON consumed by
BENCH/COMPACTION.md.

Run: python tools/compaction_bench.py  (writes BENCH/compaction_micro.json)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from torscrapper_spark.session import get_spark  # noqa: E402
from torscrapper_spark.sources.tableio import SnapshotStore  # noqa: E402

ROWS_PER_WAVE = 25_000
SHARDS = 8
REPS = 5


def _wave_pdf(w: int) -> pd.DataFrame:
    rng = np.random.default_rng(w)  # deterministic per wave
    h = rng.integers(-(1 << 62), 1 << 62, ROWS_PER_WAVE, dtype=np.int64)
    return pd.DataFrame({
        "url_hash": h,
        "wave_added": np.full(ROWS_PER_WAVE, w, dtype=np.int32),
        "pid": (h % SHARDS).astype(np.int32),
    })


def _time_read(spark, st: SnapshotStore, upto: int) -> dict:
    secs = []
    for _ in range(REPS):
        t0 = time.time()
        st.read_upto(spark, "seen", upto).count()
        secs.append(time.time() - t0)
    # median: the box is shared-tenant, single outliers are tenancy
    return {"median_s": round(sorted(secs)[len(secs) // 2], 3),
            "all_s": [round(s, 3) for s in secs]}


def main() -> None:
    import shutil

    spark = get_spark("local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="compact_bench_")
    try:
        _run(spark, root)
    finally:
        # ~1.6M rows across 65 version dirs per invocation: exactly the
        # /tmp-leak class that once ENOSPC-killed later bench legs
        # (code-review r5)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def _run(spark, root: str) -> None:
    st = SnapshotStore(root)
    out: dict = {"rows_per_wave": ROWS_PER_WAVE, "reps": REPS,
                 "uncompacted": {}, "compacted": {}}
    checkpoints = (8, 16, 32, 64)
    for w in range(max(checkpoints) + 1):
        st.write(spark.createDataFrame(_wave_pdf(w)), "seen", w,
                 partition_by="pid")
        st.commit(w, {"n": ROWS_PER_WAVE})
        if w in checkpoints:
            out["uncompacted"][w] = _time_read(spark, st, w)
    last = max(checkpoints)
    total = st.read_upto(spark, "seen", last).count()
    out["total_rows"] = int(total)
    t0 = time.time()
    info = st.compact(spark, "seen", last,
                      width=max(1, total // 250_000))
    out["compact_s"] = round(time.time() - t0, 3)
    out["compact_info"] = info
    out["compacted"][last] = _time_read(spark, st, last)
    assert st.read_upto(spark, "seen", last).count() == total
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "compaction_micro.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
