

class TestTransitionMatrix:
    def test_hand_computed(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.sessions \
            import transition_matrix
        rows = [
            # user 1: a -> b -> a -> c ; user 2: a -> b
            (1, "2024-01-01 00:00:01", "a", 1),
            (1, "2024-01-01 00:00:02", "b", 2),
            (1, "2024-01-01 00:00:03", "a", 3),
            (1, "2024-01-01 00:00:04", "c", 4),
            (2, "2024-01-01 00:00:01", "a", 5),
            (2, "2024-01-01 00:00:02", "b", 6),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string, "
            "event_id long").withColumn("ts", F.to_timestamp("ts"))
        got = {(r["from_state"], r["to_state"]): (r["n"], r["p"])
               for r in transition_matrix(df).collect()}
        # from a: ->b twice, ->c once; from b: ->a once
        assert got[("a", "b")] == (2, round(2 / 3, 4))
        assert got[("a", "c")] == (1, round(1 / 3, 4))
        assert got[("b", "a")] == (1, 1.0)
        assert ("c", "a") not in got     # last events emit nothing

    def test_twin_parity_on_events(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.sessions \
            import transition_matrix, transition_matrix_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        a = sorted(map(tuple, transition_matrix(ev).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        b = sorted(map(tuple, con.execute(
            transition_matrix_sql("events")).fetchall()))
        assert a == b


class TestInterarrival:
    def test_metronome_vs_bursty(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.sessions \
            import interarrival_stats
        rows = [("m", f"2024-01-01 00:{i:02d}:00") for i in range(30)]
        rows += ([("b", "2024-01-01 00:00:%02d" % i)
                  for i in range(25)]
                 + [("b", "2024-01-01 09:00:00"),
                    ("b", "2024-01-01 18:00:00")])
        df = spark.createDataFrame(rows, "k string, ts string") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["k"]: r for r in
               interarrival_stats(df, "ts", ["k"]).collect()}
        assert got["m"]["burstiness"] == -1.0     # metronome
        assert got["m"]["mean_gap_s"] == 60.0
        assert got["m"]["cv"] == 0.0
        assert got["b"]["burstiness"] > 0.3       # bursty

    def test_tie_order_independence_and_singleton(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.sessions \
            import interarrival_stats
        # duplicate timestamps: gap multiset {0, 10} regardless of
        # tie ordering
        rows = [("u", "2024-01-01 00:00:00"),
                ("u", "2024-01-01 00:00:00"),
                ("u", "2024-01-01 00:00:10"),
                ("solo", "2024-01-01 00:00:00")]
        df = spark.createDataFrame(rows, "k string, ts string") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["k"]: r for r in
               interarrival_stats(df, "ts", ["k"]).collect()}
        assert got["u"]["n_gaps"] == 2
        assert got["u"]["mean_gap_s"] == 5.0
        assert got["solo"]["n_gaps"] == 0
        assert got["solo"]["mean_gap_s"] is None
        assert got["solo"]["burstiness"] is None
        import pytest as _pt
        with _pt.raises(ValueError):
            interarrival_stats(df, "ts", [])

    def test_twin_parity(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.sessions \
            import interarrival_stats, interarrival_stats_sql
        import duckdb
        import random
        rng = random.Random(23)
        rows = [(f"u{rng.randint(0, 8)}",
                 f"2024-05-{rng.randint(1, 28):02d} "
                 f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:"
                 f"{rng.randint(0, 59):02d}") for _ in range(400)]
        df = spark.createDataFrame(rows, "k string, ts string") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, interarrival_stats(
            df, "ts", ["k"]).collect()))
        b = sorted(map(tuple, con.execute(interarrival_stats_sql(
            "t", "ts", ["k"])).fetchall()))
        assert a == b
