from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from webhookdb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="webhookdb-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="whdb_wh_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = "/root/testdata/sf0.001"
