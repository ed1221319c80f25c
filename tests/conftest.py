from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from osm_pbf_spark.session import get_spark

    s = get_spark("osm-pbf-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    from tests import pbf_fixtures

    d = tmp_path_factory.mktemp("pbf_fixtures")
    pbf_fixtures.build_all(str(d))
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
