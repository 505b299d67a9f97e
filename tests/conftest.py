from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from tectonic_spark import get_spark

    from tectonic_spark.sources import register_tectonic_sources

    s = get_spark(app_name="tectonic-tests", cpus=4)
    register_tectonic_sources(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
