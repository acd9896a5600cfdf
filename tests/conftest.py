from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from tersets_spark.session import get_spark

    s = get_spark("tersets_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
