import pandas as pd

from torscrapper_spark import fixtures, refsim
from torscrapper_spark.fixtures import DEFAULT_BUDGET
from torscrapper_spark.functions.urls import canonicalize_series, domain_series


def test_fixture_determinism(tiny_tables):
    again = fixtures.generate_all(fixtures.TINY)
    for name, df in tiny_tables.items():
        assert df.equals(again[name]), name


def test_seed_duplicate_present(tiny_tables):
    seeds = tiny_tables["seeds"]
    canon = canonicalize_series(seeds["url"])
    assert canon.iloc[0] == canon.iloc[-1]
    assert len(set(canon)) < len(canon)


def test_refsim_budget_never_exceeded(tiny_tables):
    t = tiny_tables
    res = refsim.simulate(t["pagestore"], t["seeds"], t["robots"], t["politeness"], max_waves=4)
    budget = {
        r.domain: int(r.budget_per_wave)
        for r in t["politeness"].itertuples(index=False)
    }
    tr = res.trace.copy()
    tr["domain"] = domain_series(tr["url"])
    per = tr.groupby(["wave", "domain"]).size()
    for (w, dom), n in per.items():
        assert n <= budget.get(dom, DEFAULT_BUDGET), (w, dom, n)


def test_refsim_robots_respected(tiny_tables):
    t = tiny_tables
    res = refsim.simulate(t["pagestore"], t["seeds"], t["robots"], t["politeness"], max_waves=4)
    from torscrapper_spark.functions.urls import path_of, robots_disallowed

    rules = {r.domain: list(r.disallow) for r in t["robots"].itertuples(index=False)}
    for u in res.trace["url"]:
        dom = domain_series(pd.Series([u])).iloc[0]
        assert not robots_disallowed(path_of(u), rules.get(dom)), u


def test_refsim_no_url_fetched_twice(tiny_tables):
    t = tiny_tables
    res = refsim.simulate(t["pagestore"], t["seeds"], t["robots"], t["politeness"], max_waves=6)
    assert res.trace["url"].is_unique
