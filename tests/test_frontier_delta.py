"""Delta-frontier mode (CrawlConfig.frontier_mode="delta").

At a 10^10-URL frontier the full-mode per-wave frontier rewrite is the
last O(|frontier|) STATE cost in the wave loop (the wave's real work is
budget-bounded). Delta mode writes only each wave's changes — selected
rows as tombstones plus the robots-gated inserts — and resolves the
chain on read (order-free anti-join; plans/crawl.py
``_resolve_frontier_chain`` documents why no version ordering is
needed). These tests pin:

* golden-trace + seen-set equivalence to the reference simulator with
  mid-crawl compaction engaged (the mode must be invisible to
  semantics),
* the O(wave) write-volume accounting of every delta dir,
* resume over a compacted delta chain,
* both revocation modes — reseed is the adversarial case for the
  order-free resolution: the revoked keys were FETCHED (tombstoned),
  so a reseed insert would be shadowed by its own tombstone unless
  revocation compacts the chain first, which is exactly the invariant
  ``_publish_revocation`` maintains.
"""

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from torscrapper_spark import refsim
from torscrapper_spark.plans import crawl as C
from torscrapper_spark.sources.tableio import SnapshotStore

TRACE_COLS = ["wave", "seq", "url", "depth", "status"]


def _inputs(spark, tiny_dir):
    return (
        C.load_pagestore(spark, f"{tiny_dir}/pagestore.parquet"),
        spark.read.parquet(f"{tiny_dir}/seeds.parquet"),
        spark.read.parquet(f"{tiny_dir}/robots.parquet"),
        spark.read.parquet(f"{tiny_dir}/politeness.parquet"),
    )


def _trace(spark, store):
    pdf = store.read_outputs(spark, "trace").orderBy("wave", "seq").toPandas()
    return pdf[TRACE_COLS].astype(
        {"wave": "int64", "seq": "int64", "depth": "int64", "status": "int64"}
    ).reset_index(drop=True)


def _cfg(**kw):
    base = dict(
        max_waves=3, default_budget=5, use_bloom=True,
        bloom_shards=4, bloom_bits=1 << 14,
        frontier_mode="delta", compact_every=2,
    )
    base.update(kw)
    return C.CrawlConfig(**base)


def _run(spark, tiny_dir, cfg, store=None):
    ps, seeds, robots, pol = _inputs(spark, tiny_dir)
    store = store or SnapshotStore(tempfile.mkdtemp(prefix="tsnap_delta_"))
    C.run_crawl(spark, store, ps, seeds, robots, pol, cfg)
    return store


# ------------------------------------------------------------- equivalence

@pytest.mark.parametrize(
    "budget,use_bloom", [(5, True), (2, False)], ids=["b5_bloom", "b2_exact"]
)
def test_delta_trace_and_seen_match_golden(
    spark, tiny_tables, tiny_dir, budget, use_bloom
):
    t = tiny_tables
    gold = refsim.simulate(
        t["pagestore"], t["seeds"], t["robots"], t["politeness"],
        max_waves=3, default_budget=budget,
    )
    cfg = _cfg(
        default_budget=budget, use_bloom=use_bloom,
        salt_buckets=4, salt_min_frontier_rows=0,
    )
    store = _run(spark, tiny_dir, cfg)

    gold_trace = gold.trace[TRACE_COLS].astype(
        {"wave": "int64", "seq": "int64", "depth": "int64", "status": "int64"}
    ).reset_index(drop=True)
    assert _trace(spark, store).equals(gold_trace)

    eng_seen = {
        r.url_hash
        for r in store.read_upto(spark, "seen", store.last_wave()).collect()
    }
    gold_urls = spark.createDataFrame(pd.DataFrame({"url": sorted(gold.seen)}))
    gold_seen = {
        r.h for r in gold_urls.select(F.xxhash64("url").alias("h")).collect()
    }
    assert eng_seen == gold_seen

    # compact_every=2 over a 3-wave crawl: compaction genuinely engaged
    assert store.base_wave("frontier") is not None


def test_delta_matches_full_mode_frontier(spark, tiny_dir):
    """The resolved delta chain is row-for-row the full-mode frontier
    at every committed wave's end state, and the manifest counts agree."""
    full = _run(
        spark, tiny_dir,
        _cfg(frontier_mode="full", compact_every=None),
    )
    delta = _run(spark, tiny_dir, _cfg())
    w = full.last_wave()
    assert delta.last_wave() == w
    f_rows = {
        tuple(r) for r in full.read(spark, "frontier", w)
        .select(*C.FRONTIER_COLS).collect()
    }
    d_rows = {
        tuple(r) for r in C._read_frontier(spark, delta, _cfg(), w)
        .select(*C.FRONTIER_COLS).collect()
    }
    assert f_rows == d_rows
    assert (
        full.manifest(w)["frontier_count"]
        == delta.manifest(w)["frontier_count"]
        == len(d_rows)
    )


# ------------------------------------------------------------ write volume

def test_delta_write_volume_is_o_wave(spark, tiny_dir):
    """Every frontier delta dir holds exactly the wave's changes —
    tombstones == that wave's selected (fetched) rows, inserts == the
    robots-gated new URLs — never a copy of the frontier. This is the
    structural O(wave) property the mode exists for; compact_every is
    set high so all delta dirs survive for inspection."""
    store = _run(spark, tiny_dir, _cfg(compact_every=99))
    last = store.last_wave()
    assert last >= 2
    for w in range(1, last + 1):
        m, m_prev = store.manifest(w), store.manifest(w - 1)
        pdf = (
            spark.read.parquet(store.table_path("frontier", w))
            .groupBy("tombstone").count().toPandas()
            .set_index("tombstone")["count"]
        )
        n_tomb = int(pdf.get(True, 0))
        n_ins = int(pdf.get(False, 0))
        assert n_tomb == int(m["fetched"]), f"wave {w} tombstones"
        assert (
            int(m_prev["frontier_count"]) - n_tomb + n_ins
            == int(m["frontier_count"])
        ), f"wave {w} live-count accounting"
        # the wave's delta is its own changes, not the frontier
        assert n_ins <= int(m["frontier_count"]) + n_tomb


# ------------------------------------------------------------------ resume

def test_delta_resume_equals_uninterrupted(spark, tiny_dir):
    full_store = _run(spark, tiny_dir, _cfg())

    part = _run(spark, tiny_dir, _cfg(max_waves=1))
    assert part.last_wave() == 1
    # resume to completion over a chain that compaction then folds
    _run(spark, tiny_dir, _cfg(), store=part)

    assert _trace(spark, full_store).equals(_trace(spark, part))
    assert (
        full_store.manifest(full_store.last_wave())
        == part.manifest(part.last_wave())
    )


def test_delta_requires_compact_every(spark, tiny_dir):
    with pytest.raises(ValueError, match="compact_every"):
        _run(spark, tiny_dir, _cfg(compact_every=None))


# -------------------------------------------------------------- revocation

@pytest.mark.parametrize("filt", ["cuckoo", "bloom"])
def test_delta_revoke_forget_unqueues_and_allows_rediscovery(
    spark, tiny_dir, filt
):
    ps, seeds, robots, pol = _inputs(spark, tiny_dir)
    cfg = _cfg(max_waves=2, seen_filter=filt, cuckoo_buckets=1 << 10)
    store = SnapshotStore(tempfile.mkdtemp(prefix="tsnap_delta_"))
    C.run_crawl(spark, store, ps, seeds, robots, pol, cfg)
    w = store.last_wave()

    queued = (
        C._read_frontier(spark, store, cfg, w)
        .select("url", "url_hash").limit(2).toPandas()
    )
    assert len(queued) == 2
    out = C.revoke_urls(
        spark, store, spark.createDataFrame(queued[["url"]]), cfg
    )
    assert out["revoked"] == 2
    assert "frontier_compaction" in out  # delta publish = compaction

    rev_hashes = set(queued["url_hash"])
    front_now = {
        r.url_hash
        for r in C._read_frontier(spark, store, cfg, w + 1)
        .select("url_hash").collect()
    }
    seen_now = {
        r.url_hash for r in store.read_upto(spark, "seen", w + 1).collect()
    }
    assert not (front_now & rev_hashes)
    assert not (seen_now & rev_hashes)
    assert front_now <= seen_now
    assert out["frontier_count"] == len(front_now)

    # resumed crawl: revoked URLs are re-discoverable and nothing is
    # ever fetched twice (no stale tombstone survived the compaction)
    C.run_crawl(spark, store, ps, seeds, robots, pol,
                _cfg(max_waves=w + 3, seen_filter=filt,
                     cuckoo_buckets=1 << 10))
    tr = _trace(spark, store)
    assert (tr.groupby("url").size() == 1).all()


def test_delta_reseed_refetches_exactly_the_revoked(spark, tiny_dir):
    """The adversarial case for order-free resolution: the reseeded
    keys carry tombstones in the chain (they were fetched), so the
    reseed insert is only visible because revocation compacts first."""
    ps, seeds, robots, pol = _inputs(spark, tiny_dir)
    cfg = _cfg(max_waves=2, seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    store = SnapshotStore(tempfile.mkdtemp(prefix="tsnap_delta_"))
    C.run_crawl(spark, store, ps, seeds, robots, pol, cfg)
    w = store.last_wave()
    pre_seen = store.manifest(w)["seen_total"]

    fetched = (
        store.read_outputs(spark, "trace")
        .filter("status = 200").select("url").distinct().limit(3).toPandas()
    )
    out = C.revoke_urls(
        spark, store, spark.createDataFrame(fetched), cfg, reseed=True
    )
    assert out["revoked"] == 3
    assert out["seen_total"] == pre_seen
    # the reseeded rows are live in the resolved frontier right now
    front = {
        r.url
        for r in C._read_frontier(spark, store, cfg, w + 1)
        .select("url").collect()
    }
    assert set(fetched["url"]) <= front

    C.run_crawl(spark, store, ps, seeds, robots, pol,
                _cfg(max_waves=w + 4, seen_filter="cuckoo",
                     cuckoo_buckets=1 << 10))
    tr = _trace(spark, store)
    counts = tr.groupby("url").size()
    rev_urls = set(fetched["url"])
    for u in rev_urls:
        assert counts[u] == 2, f"{u} fetched {counts[u]}×, expected 2"
    assert (counts[~counts.index.isin(rev_urls)] == 1).all()
