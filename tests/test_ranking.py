"""distributed_row_number: exactness vs a single-partition window
oracle, determinism, and the no-single-task-sort plan guarantee."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.ranking import (
    distributed_row_number,
)


@pytest.fixture(scope="module")
def frame(spark):
    # Skewed values + unique tiebreak ids, shuffled insertion order.
    rows = [((i * 7919) % 200, f"id{i:05d}") for i in range(2000)]
    rows = rows[::2] + rows[1::2]
    return spark.createDataFrame(rows, "v int, id string")


class TestDistributedRowNumber:
    def test_matches_global_window_oracle(self, spark, frame):
        got = {r["id"]: r["rn"] for r in distributed_row_number(
            frame, [F.desc("v"), F.asc("id")], "rn",
            num_partitions=8).collect()}
        w = Window.orderBy(F.desc("v"), F.asc("id"))
        want = {r["id"]: r["rn"] for r in frame.withColumn(
            "rn", F.row_number().over(w) - 1).collect()}
        assert got == want

    def test_partition_count_invariant(self, spark, frame):
        a = sorted(distributed_row_number(
            frame, [F.asc("id")], "rn", num_partitions=3)
            .select("id", "rn").collect())
        b = sorted(distributed_row_number(
            frame, [F.asc("id")], "rn", num_partitions=17)
            .select("id", "rn").collect())
        assert a == b

    def test_no_single_partition_exchange(self, spark, frame):
        plan = distributed_row_number(
            frame, [F.asc("id")], "rn")._sc is not None and \
            distributed_row_number(
                frame, [F.asc("id")], "rn")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "id string")
        out = distributed_row_number(df, [F.asc("id")], "rn")
        assert out.count() == 0

    def test_validates_empty_order(self, spark, frame):
        with pytest.raises(ValueError):
            distributed_row_number(frame, [], "rn")
