import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oaim_sandbox_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("oaim-tests", master="local[8]")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()
