from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("ENGINE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    s = get_spark(app_name="engine-tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
