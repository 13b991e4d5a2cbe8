import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path("/root/reference")
TESTDATA = Path("/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from large_scale_hypertextual_search_engine_spark.session import get_spark

    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
