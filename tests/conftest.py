from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds_data_pipeline_spark.session import get_spark  # noqa: E402
from wrds_data_pipeline_spark import fixtures  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def wrds_dir(tmp_path_factory):
    """WRDS-shaped fixture tables (FIXTURES.md), generated once."""
    d = tmp_path_factory.mktemp("wrds_fixtures")
    fixtures.generate(str(d))
    return str(d)


@pytest.fixture(scope="session")
def wrds(spark, wrds_dir):
    from wrds_data_pipeline_spark.catalog import WRDS_TABLES, load_tables

    return load_tables(spark, wrds_dir, WRDS_TABLES)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def driver_tables(spark, sf_dir):
    from wrds_data_pipeline_spark.catalog import register_views

    return register_views(spark, sf_dir)
