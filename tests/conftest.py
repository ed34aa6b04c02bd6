from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = ensure_engine_confs(get_session("tests", cpus=8, shuffle_partitions=8))
    yield s
    s.stop()
