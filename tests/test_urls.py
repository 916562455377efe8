import numpy as np
import pandas as pd

from torscrapper_spark.functions import urls


def test_canonicalize_cases():
    cases = {
        " http://D0001.ONION:80/p/3#frag ": "http://d0001.onion/p/3",
        "http://d0001.onion/p/0?sid=4&a=1": "http://d0001.onion/p/0?a=1&sid=4",
        "http://d0001.onion": "http://d0001.onion/",
        "HTTP://x.onion/a#z": "http://x.onion/a",
        "http://x.onion/a?": "http://x.onion/a",
        "notaurl": "notaurl",
    }
    got = urls.canonicalize_series(pd.Series(list(cases)))
    assert list(got) == list(cases.values())


def test_canonicalize_idempotent_property():
    rng = np.random.default_rng(7)
    raws = []
    for _ in range(300):
        host = f"d{rng.integers(0, 50):04d}.onion"
        if rng.random() < 0.4:
            host = host.upper()
        port = ":80" if rng.random() < 0.3 else ""
        path = f"/p/{rng.integers(0, 30)}"
        q = "?b=2&a=1" if rng.random() < 0.3 else ""
        frag = "#f" if rng.random() < 0.3 else ""
        raws.append(f"http://{host}{port}{path}{q}{frag}")
    once = urls.canonicalize_series(pd.Series(raws))
    twice = urls.canonicalize_series(once)
    assert list(once) == list(twice)


def test_domain_and_path():
    c = urls.canonicalize_series(pd.Series(["http://A.onion:80/p/1?z=1&a=2#f"]))
    assert urls.domain_series(c).iloc[0] == "a.onion"
    assert urls.path_of(c.iloc[0]) == "/p/1?a=2&z=1"
    assert urls.path_of("http://x.onion") == "/"


def test_robots_disallowed():
    assert urls.robots_disallowed("/p/10", ["/p/1"])
    assert not urls.robots_disallowed("/p/2", ["/p/1"])
    assert urls.robots_disallowed("/anything", ["/"])
    assert not urls.robots_disallowed("/x", [])
    assert not urls.robots_disallowed("/x", None)
    assert not urls.robots_disallowed("/x", [""])


def test_extract_links():
    html = pd.Series(['<a href="http://a.onion/1">x</a><a href="http://b.onion/2">y</a>', "<p>none</p>"])
    out = urls.extract_links_series(html)
    assert list(out.iloc[0]) == ["http://a.onion/1", "http://b.onion/2"]
    assert list(out.iloc[1]) == []


def test_canonicalize_null_propagates():
    """A null URL must stay null — .astype(str) used to stringify
    pd.NA into the literal '<NA>', a phantom URL that got hashed,
    budgeted, and 404-fetched (code-review r5)."""
    import pandas as pd

    from torscrapper_spark.functions.urls import canonicalize_series

    out = canonicalize_series(pd.Series([None, "HTTP://A.Onion/#f"]))
    assert out.iloc[0] is None
    assert out.iloc[1] == "http://a.onion/"
