from __future__ import annotations

import shutil
import tempfile

import pytest

from torscrapper_spark import fixtures
from torscrapper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_tables():
    return fixtures.generate_all(fixtures.TINY)


@pytest.fixture(scope="session")
def tiny_dir(tiny_tables):
    d = tempfile.mkdtemp(prefix="tsfx_")
    fixtures.write_parquet(tiny_tables, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def tmp_store_dir():
    d = tempfile.mkdtemp(prefix="tsnap_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def medium_tables():
    return fixtures.generate_all(fixtures.MEDIUM)


@pytest.fixture(scope="session")
def large_tables():
    return fixtures.generate_all(fixtures.LARGE)


@pytest.fixture(scope="session")
def large_dir(large_tables):
    d = tempfile.mkdtemp(prefix="tsfx_lg_")
    fixtures.write_parquet(large_tables, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def medium_dir(medium_tables):
    d = tempfile.mkdtemp(prefix="tsfx_med_")
    fixtures.write_parquet(medium_tables, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)
