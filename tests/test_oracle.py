"""DuckDB-oracle parity for the whole queries() surface (SURVEY.md §5.2
item 5). Runs at sf0.001 to keep the suite fast; the driver re-runs the
same comparison at sf0.01 and tools/oracle_check.py does it on demand."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.oracle_check import compare, duck_con  # noqa: E402

from torscrapper_spark.queries import registry  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_REG = registry()
_ORACLED = sorted(n for n, (_f, s) in _REG.items() if s is not None)
_ROWS_ONLY = sorted(
    n for n, (_f, s) in _REG.items() if s is None and n != "q43_crawl_wave_trace"
)


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, con, name):
    fn, sql = _REG[name]
    got = fn(spark, SF_DIR).toPandas()
    want = con.execute(sql).df()
    errs = compare(got, want)
    assert not errs, f"{name}: {errs}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = _REG[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0
