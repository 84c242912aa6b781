from __future__ import annotations

import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from xhtml_parser_spark.session import get_spark

    s = get_spark("xhtml-parser-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
