"""Link graph (operators/graph.py): extraction/host-edge parity,
PageRank vs an independent numpy power iteration AND the unrolled
DuckDB CTE oracle, dangling/weighted semantics, rank conservation.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.graph import (
    extract_links,
    extract_links_sql,
    host_edges,
    pagerank,
    pagerank_reference,
    pagerank_sql,
)


class TestExtractLinks:
    DOCS = [
        (1, 'see https://a.test/x and <a href="https://b.test/y">b</a>'),
        (2, "nothing here"),
        (3, '<a href="/relative/path">r</a> http://c.test./z?q=1'),
    ]

    def test_modes(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        urls = sorted((r["doc_id"], r["link"]) for r in
                      extract_links(df, mode="urls").collect())
        assert (2, "nothing here") not in urls
        assert any(l.startswith("https://a.test") for _, l in urls)
        hrefs = {r["link"] for r in
                 extract_links(df, mode="href").collect()}
        assert "/relative/path" in hrefs and "https://b.test/y" in hrefs
        both = {r["link"] for r in
                extract_links(df, mode="both").collect()}
        assert both >= hrefs

    def test_matches_duckdb(self, spark):
        import duckdb
        import pandas as pd
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        for mode in ("urls", "href", "both"):
            got = sorted((r["doc_id"], r["link"]) for r in
                         extract_links(df, mode=mode).collect())
            con = duckdb.connect()
            con.register("documents", pd.DataFrame(
                self.DOCS, columns=["doc_id", "text"]))
            want = sorted(
                (int(r["doc_id"]), r["link"]) for _, r in con.execute(
                    extract_links_sql(mode=mode)).df().iterrows())
            assert got == want, mode


class TestHostEdges:
    def test_host_graph(self, spark):
        rows = [
            ("https://a.test/p1", "https://b.test/x"),
            ("https://a.test/p2", "https://b.test/y"),
            ("https://A.test:8080/p3", "https://c.test./z"),
            ("https://a.test/p4", "https://a.test/self"),  # self loop
            ("https://a.test/p5", "/relative"),            # no host
        ]
        df = spark.createDataFrame(rows, "url string, link string")
        got = {(r["src"], r["dst"]): r["weight"]
               for r in host_edges(df).collect()}
        assert got == {("a.test", "b.test"): 2, ("a.test", "c.test"): 1}
        with_self = {(r["src"], r["dst"]): r["weight"]
                     for r in host_edges(df, keep_self=True).collect()}
        assert with_self[("a.test", "a.test")] == 1


class TestPageRank:
    EDGES = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 1.0), ("d", "a", 1.0)]  # d dangles into a

    def _spark_ranks(self, spark, edges, iters=3, weight=None):
        df = spark.createDataFrame(edges, "src string, dst string, w double")
        return {r["node"]: r["rank"] for r in
                pagerank(df, weight_col=weight, iters=iters).collect()}

    def test_matches_numpy_reference(self, spark):
        got = self._spark_ranks(spark, self.EDGES, iters=4)
        want = pagerank_reference(self.EDGES, iters=4)
        assert set(got) == set(want)
        assert all(abs(got[k] - want[k]) < 2e-6 for k in got)

    def test_ranks_sum_to_one(self, spark):
        got = self._spark_ranks(spark, self.EDGES, iters=3)
        assert abs(sum(got.values()) - 1.0) < 1e-4

    def test_dangling_node_handled(self, spark):
        # e has no outlinks: its mass must redistribute, not vanish
        edges = [("a", "e", 1.0), ("b", "e", 1.0), ("e2", "a", 1.0),
                 ("e2", "b", 1.0)]
        got = self._spark_ranks(spark, edges, iters=5)
        want = pagerank_reference(edges, iters=5)
        assert all(abs(got[k] - want[k]) < 2e-6 for k in got)
        assert abs(sum(got.values()) - 1.0) < 1e-4

    def test_weighted_vs_unweighted(self, spark):
        edges = [("a", "b", 10.0), ("a", "c", 1.0), ("b", "a", 1.0),
                 ("c", "a", 1.0)]
        wgt = self._spark_ranks(spark, edges, iters=3, weight="w")
        unw = self._spark_ranks(spark, edges, iters=3, weight=None)
        assert wgt["b"] > unw["b"]      # weight shifts mass toward b
        want = pagerank_reference(edges, iters=3)
        assert all(abs(wgt[k] - want[k]) < 2e-6 for k in wgt)

    def test_matches_duckdb_unrolled(self, spark):
        import duckdb
        import pandas as pd
        rnd = random.Random(5)
        hosts = [f"h{i}" for i in range(20)]
        edges = [(rnd.choice(hosts), rnd.choice(hosts), 1.0)
                 for _ in range(80)]
        edges = [(s, t, w) for s, t, w in edges if s != t]
        df = spark.createDataFrame(edges,
                                   "src string, dst string, w double")
        got = sorted((r["node"], r["rank"]) for r in
                     pagerank(df, weight_col="w", iters=3).collect())
        con = duckdb.connect()
        con.register("edges_t", pd.DataFrame(
            edges, columns=["src", "dst", "w"]))
        sql = pagerank_sql("SELECT src, dst, w FROM edges_t",
                           weight_col="w", iters=3)
        want = sorted((r["node"], r["rank"]) for _, r in
                      con.execute(sql).df().iterrows())
        assert got == want

    def test_bad_args(self, spark):
        df = spark.createDataFrame([("a", "b", 1.0)],
                                   "src string, dst string, w double")
        with pytest.raises(ValueError):
            pagerank(df, iters=0)
        with pytest.raises(ValueError):
            pagerank(df, damping=1.0)
        empty = spark.createDataFrame([],
                                      "src string, dst string, w double")
        with pytest.raises(ValueError):
            pagerank(empty)

    def test_no_cartesian_on_data(self, spark):
        # the only crossJoins are the 1-row dangling/N scalars
        df = spark.createDataFrame(self.EDGES,
                                   "src string, dst string, w double")
        out = pagerank(df, iters=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestPageRankConvergence:
    def test_tol_stop_matches_full_run(self, spark):
        edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
                 ("a", "c", 1.0), ("d", "a", 1.0)]
        df = spark.createDataFrame(edges,
                                   "src string, dst string, w double")
        # generous max iters + tight tol: converged result must agree
        # with a long fixed-iteration run to the rounding precision
        conv = {r["node"]: r["rank"] for r in
                pagerank(df, iters=100, tol=1e-9).collect()}
        full = {r["node"]: r["rank"] for r in
                pagerank(df, iters=60).collect()}
        assert set(conv) == set(full)
        assert all(abs(conv[k] - full[k]) <= 1e-5 for k in conv)

    def test_tol_stops_early(self, spark):
        # a symmetric 2-cycle converges immediately; with tol set the
        # loop must exit long before the iteration cap (wall-clock
        # proxy: the call completes with a tiny cap overshoot budget)
        df = spark.createDataFrame([("a", "b", 1.0), ("b", "a", 1.0)],
                                   "src string, dst string, w double")
        out = {r["node"]: r["rank"] for r in
               pagerank(df, iters=50, tol=1e-12).collect()}
        assert out == {"a": 0.5, "b": 0.5}

    def test_bad_tol(self, spark):
        df = spark.createDataFrame([("a", "b", 1.0)],
                                   "src string, dst string, w double")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pagerank(df, tol=0.0)


class TestTriangles:
    def _tri(self):
        from nifi_extracttext_processor_spark.operators.graph import (
            triangle_counts,
            triangle_counts_sql,
            triangle_reference,
        )
        return triangle_counts, triangle_counts_sql, triangle_reference

    def test_golden_k4_pendant_with_noise(self, spark):
        tc, _, ref = self._tri()
        # K4 + pendant, plus self-loop / reversed / duplicate edges
        # that normalization must erase
        edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                 ("b", "d"), ("c", "d"), ("d", "e"), ("b", "a"),
                 ("a", "a"), ("a", "b")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["degree"], r["triangles"], r["lcc"])
               for r in tc(df).collect()}
        assert got == ref(edges)
        assert got["a"] == (3, 3, 1.0)   # K4 corner
        assert got["d"] == (4, 3, 0.5)   # K4 corner + pendant
        assert got["e"] == (1, 0, 0.0)   # pendant: lcc 0 under d<2

    def test_matches_reference_on_random_graph(self, spark):
        tc, _, ref = self._tri()
        rng = random.Random(8)
        edges = [(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                 for _ in range(150)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["degree"], r["triangles"], r["lcc"])
               for r in tc(df).collect()}
        assert got == ref(edges)

    def test_triangle_free_graph(self, spark):
        tc, _, _ = self._tri()
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")],
            "src string, dst string")
        rows = tc(df).collect()
        assert all(r["triangles"] == 0 and r["lcc"] == 0.0
                   for r in rows)
        assert len(rows) == 4

    def test_duckdb_parity(self, spark):
        import duckdb

        tc, tc_sql, _ = self._tri()
        rng = random.Random(17)
        edges = [(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                 for _ in range(120)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = sorted(map(tuple, tc(df).collect()))
        con = duckdb.connect()
        vals = ", ".join(f"('{s}', '{t}')" for s, t in edges)
        seed = f"SELECT * FROM (VALUES {vals}) v(src, dst)"
        want = sorted(map(tuple,
                          con.execute(tc_sql(seed)).df()
                          .itertuples(index=False)))
        assert got == want

    def test_star_hub_generates_no_wedges_plan(self, spark):
        # the degree-orientation scale property: every hub edge points
        # INTO the hub, so the skew-killer holds by construction; and
        # the plan stays hash-join only
        tc, _, _ = self._tri()
        edges = [("hub", f"leaf{i}") for i in range(50)]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = tc(df)
        assert out.filter(F.col("triangles") > 0).count() == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestHits:
    def _py_hits(self, edges, iters=3):
        """Independent plain-loop HITS with the same L1 norms."""
        e = sorted(set(edges))
        nodes = sorted({s for s, _ in e} | {d for _, d in e})
        h = {n: 1.0 for n in nodes}
        a = {}
        for _ in range(iters):
            a = {n: 0.0 for n in nodes}
            for s, d in e:
                a[d] += h[s]
            sa = sum(a.values())
            a = {n: v / sa for n, v in a.items()}
            h = {n: 0.0 for n in nodes}
            for s, d in e:
                h[s] += a[d]
            sh = sum(h.values())
            h = {n: v / sh for n, v in h.items()}
        return {n: (round(a[n], 6), round(h[n], 6)) for n in nodes}

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def test_hub_and_authority_separate(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import hits
        # hub H links to authorities A1..A3; a stray edge elsewhere
        rows = [("H", "A1"), ("H", "A2"), ("H", "A3"),
                ("x", "A1"), ("y", "A2"), ("H2", "A1"),
                ("H2", "A2")]
        got = {r["node"]: (r["authority"], r["hub"]) for r in
               hits(self._edges(spark, rows)).collect()}
        want = self._py_hits(rows)
        for n, (wa, wh) in want.items():
            assert got[n][0] == pytest.approx(wa, abs=2e-6), n
            assert got[n][1] == pytest.approx(wh, abs=2e-6), n
        # H is the best hub but no authority; A1 the best authority
        assert got["H"][1] == max(v[1] for v in got.values())
        assert got["H"][0] == 0.0
        assert got["A1"][0] == max(v[0] for v in got.values())

    def test_duckdb_parity(self, spark):
        import duckdb
        import pandas as pd
        from nifi_extracttext_processor_spark.operators.graph import (
            hits, hits_sql,
        )
        rows = [(f"n{i % 7}", f"n{(i * 3 + 1) % 7}")
                for i in range(30) if i % 7 != (i * 3 + 1) % 7]
        got = sorted(tuple(r) for r in
                     hits(self._edges(spark, rows)).collect())
        con = duckdb.connect()
        con.register("ed", pd.DataFrame(rows, columns=["src", "dst"]))
        want = sorted(tuple(r) for r in con.execute(
            hits_sql("SELECT src, dst FROM ed")).fetchall())
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0]
            assert g[1] == pytest.approx(w[1], abs=2e-6)
            assert g[2] == pytest.approx(w[2], abs=2e-6)

    def test_parallel_edges_count_once(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import hits
        once = {r["node"]: (r["authority"], r["hub"]) for r in hits(
            self._edges(spark, [("a", "b"), ("c", "b")])).collect()}
        dup = {r["node"]: (r["authority"], r["hub"]) for r in hits(
            self._edges(spark, [("a", "b"), ("a", "b"),
                                ("c", "b")])).collect()}
        assert once == dup

    def test_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import hits
        with pytest.raises(ValueError, match="iters"):
            hits(self._edges(spark, [("a", "b")]), iters=0)
        with pytest.raises(ValueError, match="empty"):
            hits(self._edges(spark, []).filter("1=0"))


class TestConnectedComponents:
    def test_known_graph(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components,
        )
        # two chains + a reversed/duplicate edge + a self-loop
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "b"),   # comp {a,b,c}
             ("x", "y"),                           # comp {x,y}
             ("z", "z")],                          # singleton
            "src string, dst string")
        got = {r["node"]: r["component"] for r in
               connected_components(edges).collect()}
        assert got == {"a": "a", "b": "a", "c": "a",
                       "x": "x", "y": "x", "z": "z"}

    def test_long_chain_and_max_iter(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components,
        )
        # chain n00-n01-...-n09: diameter 9
        edges = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(9)],
            "src string, dst string")
        got = {r["node"]: r["component"] for r in
               connected_components(edges).collect()}
        assert set(got.values()) == {"n00"}
        import pytest as _pt
        with _pt.raises(RuntimeError):
            connected_components(edges, max_iter=2)
        with _pt.raises(ValueError):
            connected_components(edges, max_iter=0)

    def test_twin_parity_random_graph(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components,
            connected_components_sql,
        )
        import duckdb
        import random
        rng = random.Random(13)
        rows = [(f"v{rng.randint(0, 60)}", f"v{rng.randint(0, 60)}")
                for _ in range(80)]
        edges = spark.createDataFrame(rows, "src string, dst string")
        con = duckdb.connect()
        con.register("e", edges.toPandas())
        a = sorted(map(tuple, connected_components(edges).collect()))
        b = sorted(map(tuple, con.execute(connected_components_sql(
            "SELECT src, dst FROM e")).fetchall()))
        assert a == b


class TestStarContraction:
    def test_matches_min_label_on_random_graph(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components,
            connected_components_large,
        )
        import random
        rng = random.Random(7)
        rows = [(f"v{rng.randint(0, 60)}", f"v{rng.randint(0, 60)}")
                for _ in range(90)]
        edges = spark.createDataFrame(rows, "src string, dst string")
        a = sorted(map(tuple,
                       connected_components_large(edges).collect()))
        b = sorted(map(tuple, connected_components(edges).collect()))
        assert a == b

    def test_known_graph_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components_large,
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "b"),
             ("x", "y"), ("z", "z")],
            "src string, dst string")
        got = {r["node"]: r["component"] for r in
               connected_components_large(edges).collect()}
        assert got == {"a": "a", "b": "a", "c": "a",
                       "x": "x", "y": "x", "z": "z"}
        import pytest as _pt
        with _pt.raises(ValueError):
            connected_components_large(edges, max_iter=0)

    def test_deep_chain_where_min_label_fails(self, spark):
        """The escalation contract (VERDICT r12 task 6): a diameter-
        120 chain needs ~120 min-label rounds (RAISES at max_iter=15)
        but only O(log^2 n) contraction rounds — the large-graph
        operator must finish it inside 15."""
        from nifi_extracttext_processor_spark.operators.graph import (
            connected_components,
            connected_components_large,
        )
        edges = spark.createDataFrame(
            [(f"m{i:03d}", f"m{i + 1:03d}") for i in range(120)],
            "src string, dst string")
        import pytest as _pt
        with _pt.raises(RuntimeError):
            connected_components(edges, max_iter=15)
        got = connected_components_large(edges, max_iter=15).collect()
        assert len(got) == 121
        assert {r["component"] for r in got} == {"m000"}


class TestBfsDistances:
    def test_chain_distances_and_cap(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            bfs_distances,
        )
        edges = spark.createDataFrame(
            [(f"n{i}", f"n{i + 1}") for i in range(6)],
            "src string, dst string")
        got = {r["node"]: r["dist"] for r in
               bfs_distances(edges, ["n0"], max_hops=10).collect()}
        assert got == {f"n{i}": i for i in range(7)}
        # the hop cap truncates the readout (contract, not error)
        capped = {r["node"]: r["dist"] for r in
                  bfs_distances(edges, ["n0"], max_hops=3).collect()}
        assert capped == {f"n{i}": i for i in range(4)}

    def test_multi_source_and_offgraph_source(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            bfs_distances,
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")],
            "src string, dst string")
        got = {r["node"]: r["dist"] for r in
               bfs_distances(edges, ["c", "x", "zzz"]).collect()}
        # min over sources; zzz (not in graph) still reports dist 0
        assert got == {"c": 0, "x": 0, "zzz": 0,
                       "b": 1, "y": 1, "a": 2}
        import pytest as _pt
        with _pt.raises(ValueError):
            bfs_distances(edges, [])
        with _pt.raises(ValueError):
            bfs_distances(edges, ["a"], max_hops=0)

    def test_twin_parity_cyclic(self, spark):
        from nifi_extracttext_processor_spark.operators.graph import (
            bfs_distances,
            bfs_distances_sql,
        )
        import duckdb
        import random
        rng = random.Random(19)
        rows = [(f"v{rng.randint(0, 30)}", f"v{rng.randint(0, 30)}")
                for _ in range(50)]
        edges = spark.createDataFrame(rows, "src string, dst string")
        con = duckdb.connect()
        con.register("e", edges.toPandas())
        a = sorted(map(tuple, bfs_distances(
            edges, ["v0", "v7"], max_hops=8).collect()))
        b = sorted(map(tuple, con.execute(bfs_distances_sql(
            "SELECT src, dst FROM e", ["v0", "v7"],
            max_hops=8)).fetchall()))
        assert a == b
