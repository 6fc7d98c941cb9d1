from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from nifi_extracttext_processor_spark.session import get_spark

    warehouse = tempfile.mkdtemp(prefix="graft_warehouse_")
    # AQE off for the TEST session only (r17, VERDICT r16 task 2 —
    # the driver-budget fix): at test scale every shuffle is a few KB
    # and AQE's per-query-stage re-optimization is pure overhead —
    # measured 143-173 s -> 123-128 s on a two-file proxy, no effect
    # on compute-bound files. Values cannot depend on it: the engine's
    # cross-engine exactness contract is partition-independence
    # (decimal/integer sums, dround quantization, rank-based stats),
    # and the suite already attests that across a much larger config
    # gap (tests at local[8]/sp=8 vs the driver at local[32]/sp=32,
    # AQE on). bench.py / session.py defaults are untouched.
    s = get_spark("tests", shuffle_partitions=8,
                  extra_conf={"spark.sql.warehouse.dir": warehouse,
                              "spark.sql.adaptive.enabled": "false"})
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
