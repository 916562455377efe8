"""Resumable restarts (BASELINE.json:14): killing the loop after any
committed wave and re-running continues to an identical final state."""

import tempfile

from torscrapper_spark.plans import crawl as C
from torscrapper_spark.sources.tableio import SnapshotStore


def _inputs(spark, tiny_dir):
    return (
        C.load_pagestore(spark, f"{tiny_dir}/pagestore.parquet"),
        spark.read.parquet(f"{tiny_dir}/seeds.parquet"),
        spark.read.parquet(f"{tiny_dir}/robots.parquet"),
        spark.read.parquet(f"{tiny_dir}/politeness.parquet"),
    )


def _trace(spark, store):
    return (
        store.read_outputs(spark, "trace")
        .orderBy("wave", "seq")
        .select("wave", "seq", "url", "depth", "status")
        .toPandas()
    )


def test_resume_equals_uninterrupted(spark, tiny_dir):
    ps, seeds, robots, pol = _inputs(spark, tiny_dir)
    full_cfg = C.CrawlConfig(max_waves=3, use_bloom=True, bloom_shards=4, bloom_bits=1 << 14)

    s_full = SnapshotStore(tempfile.mkdtemp())
    C.run_crawl(spark, s_full, ps, seeds, robots, pol, full_cfg)

    s_part = SnapshotStore(tempfile.mkdtemp())
    # "crash" after wave 1's commit…
    C.run_crawl(spark, s_part, ps, seeds, robots, pol,
                C.CrawlConfig(max_waves=1, use_bloom=True, bloom_shards=4, bloom_bits=1 << 14))
    assert s_part.last_wave() == 1
    # …and resume to completion
    C.run_crawl(spark, s_part, ps, seeds, robots, pol, full_cfg)

    assert _trace(spark, s_full).equals(_trace(spark, s_part))
    m_full = s_full.manifest(s_full.last_wave())
    m_part = s_part.manifest(s_part.last_wave())
    assert m_full == m_part
