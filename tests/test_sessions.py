

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
