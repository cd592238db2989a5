from __future__ import annotations

import tempfile

import pytest

from skylogix_real_time_weather_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="spark_wh_")
    s = get_spark(
        app_name="skylogix-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # keep catalog artifacts (warehouse, derby metastore) out of the repo
            "spark.sql.warehouse.dir": f"{wh}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}/derby",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
