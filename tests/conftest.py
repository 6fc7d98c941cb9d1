from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from nifi_extracttext_processor_spark.session import get_spark

    warehouse = tempfile.mkdtemp(prefix="graft_warehouse_")
    s = get_spark("tests", shuffle_partitions=8,
                  extra_conf={"spark.sql.warehouse.dir": warehouse})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


REFERENCE_RESOURCES = (
    "/root/reference/nifi-extracttext-processors/src/test/resources")


@pytest.fixture(scope="session")
def reference_fixture():
    """Loader for the reference's own binary test files (read-only)."""
    def _load(name: str) -> bytes:
        p = os.path.join(REFERENCE_RESOURCES, name)
        if not os.path.exists(p):
            pytest.skip(f"reference fixture {name} unavailable")
        with open(p, "rb") as f:
            return f.read()
    return _load
