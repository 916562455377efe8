import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from torscrapper_spark.operators import seen as seen_op
from torscrapper_spark.operators.politeness import budget_select, robots_gate
from torscrapper_spark.operators.seq import with_global_seq


def _frontier(spark, rows):
    pdf = pd.DataFrame(rows, columns=["url", "url_hash", "domain", "depth", "discovered_wave"])
    return spark.createDataFrame(
        pdf, "url string, url_hash long, domain string, depth int, discovered_wave int"
    )


def test_robots_gate(spark):
    f = _frontier(spark, [
        ("http://a.onion/p/1", 1, "a.onion", 0, 0),
        ("http://a.onion/p/10", 2, "a.onion", 0, 0),
        ("http://a.onion/q/1", 3, "a.onion", 0, 0),
        ("http://b.onion/p/1", 4, "b.onion", 0, 0),
        ("http://c.onion/x", 5, "c.onion", 0, 0),
    ])
    robots = spark.createDataFrame(
        pd.DataFrame({"domain": ["a.onion", "b.onion"], "disallow": [["/p/1"], ["/"]]}),
        "domain string, disallow array<string>",
    )
    kept = sorted(r.url for r in robots_gate(f, robots).collect())
    assert kept == ["http://a.onion/q/1", "http://c.onion/x"]


def test_budget_select_exact_and_salted_agree(spark):
    rows = []
    k = 0
    for dom, n in [("hot.onion", 40), ("cold.onion", 3)]:
        for i in range(n):
            rows.append((f"http://{dom}/p/{i:03d}", k, dom, i % 3, 0))
            k += 1
    f = _frontier(spark, rows)
    pol = spark.createDataFrame(
        [("hot.onion", 4)], "domain string, budget_per_wave int"
    )
    plain = budget_select(f, pol, default_budget=2, salt_buckets=0)
    salted = budget_select(f, pol, default_budget=2, salt_buckets=4)
    key = lambda df: sorted((r.domain, r.url) for r in df.collect())
    assert key(plain) == key(salted)
    per_dom = pd.DataFrame(key(plain), columns=["domain", "url"]).groupby("domain").size()
    assert per_dom["hot.onion"] == 4 and per_dom["cold.onion"] == 2
    # priority order: lowest depth first, then url
    urls_hot = [u for d, u in key(plain) if d == "hot.onion"]
    expect = sorted(
        [r[0] for r in rows if r[2] == "hot.onion"],
        key=lambda u: (int(u[-3:]) % 3, u),
    )[:4]
    assert sorted(urls_hot) == sorted(expect)


def test_with_global_seq_matches_sorted_enumerate(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "url": [f"http://x.onion/{i:04d}" for i in rng.permutation(500)],
        "depth": rng.integers(0, 4, 500),
        "discovered_wave": rng.integers(0, 3, 500),
    })
    df = spark.createDataFrame(pdf, "url string, depth int, discovered_wave int")
    out = with_global_seq(df, ["depth", "discovered_wave", "url"], num_partitions=7)
    got = out.orderBy("seq").toPandas()
    exp = pdf.sort_values(["depth", "discovered_wave", "url"]).reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["seq"]) == list(range(1, 501))
    getattr(out, "_seq_cache").unpersist()


def test_bloom_no_false_negatives_and_exactness(spark):
    rng = np.random.default_rng(11)
    seen_hashes = rng.integers(-(1 << 62), 1 << 62, 2000, dtype=np.int64)
    cand_hashes = np.concatenate([seen_hashes[:500], rng.integers(-(1 << 62), 1 << 62, 1500, dtype=np.int64)])
    seen_df = spark.createDataFrame(pd.DataFrame({"url_hash": seen_hashes}), "url_hash long")
    cand_df = spark.createDataFrame(
        pd.DataFrame({"url_hash": cand_hashes, "url": [f"u{i}" for i in range(len(cand_hashes))]}),
        "url_hash long, url string",
    )
    shards, nbits, k = 4, 1 << 15, 5
    bloom = seen_op.update_bloom(
        seen_op.empty_bloom(spark, shards, nbits, k), seen_df, shards
    )
    probed = seen_op.probe_bloom(cand_df, bloom, shards).toPandas()
    seen_set = set(int(h) for h in seen_hashes)
    truly_seen = probed["url_hash"].astype("int64").map(lambda h: h in seen_set)
    # no false negatives: everything seen must be flagged maybe_seen
    assert probed.loc[truly_seen.values, "maybe_seen"].all()
    # fast path == exact path
    fast, probe_cache = seen_op.new_candidates(
        cand_df, seen_df, bloom, shards, use_bloom=True
    )
    exact = seen_op.exact_new(cand_df, seen_df)
    assert sorted(r.url for r in fast.collect()) == sorted(r.url for r in exact.collect())
    if probe_cache is not None:
        probe_cache.unpersist()


def test_bloom_incremental_update_covers_both_deltas(spark):
    a = spark.createDataFrame(pd.DataFrame({"url_hash": np.arange(0, 100, dtype=np.int64)}), "url_hash long")
    b = spark.createDataFrame(pd.DataFrame({"url_hash": np.arange(100, 200, dtype=np.int64)}), "url_hash long")
    shards, nbits, k = 2, 1 << 12, 4
    bloom = seen_op.update_bloom(seen_op.empty_bloom(spark, shards, nbits, k), a, shards)
    bloom = seen_op.update_bloom(bloom, b, shards)
    cand = spark.createDataFrame(
        pd.DataFrame({"url_hash": np.arange(0, 200, dtype=np.int64), "url": [f"u{i}" for i in range(200)]}),
        "url_hash long, url string",
    )
    probed = seen_op.probe_bloom(cand, bloom, shards).toPandas()
    assert probed["maybe_seen"].all()
