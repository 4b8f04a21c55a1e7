"""Property-based tests (hypothesis) for driver-side logic.

SURVEY §5 notes the reference's only unit test covers ``strtobool`` and
admits it "should be generative" — this is that, plus the routing rules
the reference never tested at all.
"""

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_flex_pyarrow_to_gds_spark.functions.scalar import strtobool
from dataflow_flex_pyarrow_to_gds_spark.model import Graph, Node

TRUTHY = ["y", "yes", "t", "true", "on", "1"]
FALSY = ["n", "no", "f", "false", "off", "0"]


@given(st.sampled_from(TRUTHY), st.booleans())
def test_strtobool_truthy(word, upper):
    assert strtobool(word.upper() if upper else word) == 1


@given(st.sampled_from(FALSY), st.booleans())
def test_strtobool_falsy(word, upper):
    assert strtobool(word.upper() if upper else word) == 0


@given(st.text(max_size=8))
def test_strtobool_other_raises(s):
    if s.lower() not in TRUTHY + FALSY:
        try:
            strtobool(s)
            raise AssertionError(f"should have raised for {s!r}")
        except ValueError:
            pass


_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=12,
)


@given(st.lists(_names, min_size=1, max_size=6, unique=True))
@settings(max_examples=50)
def test_routing_first_match_wins(sources):
    """node_for_src returns the FIRST matching element (anchored match)."""
    nodes = tuple(Node(source=re.escape(s), key_field="k") for s in sources)
    g = Graph(name="g", nodes=nodes)
    for s in sources:
        got = g.node_for_src(s)
        expected = next(n for n in nodes if re.match(n.source, s))
        assert got is expected


@given(_names)
@settings(max_examples=50)
def test_routing_miss_returns_none(name):
    g = Graph(name="g", nodes=(Node(source="zzz-never", key_field="k"),))
    assert g.node_for_src(name) is None


@given(
    st.lists(_names, min_size=1, max_size=5, unique=True),
    st.dictionaries(_names, _names, max_size=4),
)
@settings(max_examples=50)
def test_model_json_roundtrip(sources, props):
    g = Graph(
        name="g",
        nodes=tuple(
            Node(source=re.escape(s), key_field="k", properties=dict(props))
            for s in sources
        ),
    )
    g2 = Graph.from_json(g.to_json())
    assert g2.to_json() == g.to_json()
    assert json.loads(g2.to_json())["name"] == "g"


@given(st.lists(_names, min_size=1, max_size=6, unique=True))
@settings(max_examples=50)
def test_fields_always_include_key(sources):
    for s in sources:
        n = Node(source=s if s else ".", key_field="kf",
                 properties={"a": "b"})
        fields = n.fields()
        assert "kf" in fields and "a" in fields
        assert all(fields)  # no falsy entries (pipeline.py:113 filter)


def test_balanced_sum_sql_cross_engine_bitwise(spark):
    """The balanced-tree sum helper is the repo's IEEE contract: for
    arbitrary double literals, Spark and DuckDB must produce the SAME
    bits. Property-tested over adversarial magnitudes (cancellation,
    spread exponents) where a different association order WOULD differ
    in the last ulps."""
    import struct

    import duckdb
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        _dbl,
        balanced_sum_sql,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(vals):
        expr = balanced_sum_sql([_dbl(v) for v in vals])
        got_spark = spark.sql(f"SELECT {expr} AS s").collect()[0]["s"]
        got_duck = duckdb.sql(f"SELECT {expr} AS s").fetchone()[0]
        assert struct.pack("<d", got_spark) == struct.pack("<d", got_duck)

    check()


def test_kmv_bottom_k_property(spark):
    """For arbitrary value multisets, the sketch is EXACTLY the k
    smallest distinct portable hashes with dense ranks, and the
    below-k estimate equals the true distinct count."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_estimate,
        kmv_sketch,
    )

    def phash(t: str) -> int:
        hx = hashlib.md5(t.encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        if hi >= 1 << 31:
            hi -= 1 << 32
        return hi * (1 << 32) + lo

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=111),
                min_size=1, max_size=4,
            ),
            min_size=1, max_size=60,
        ),
        st.integers(min_value=2, max_value=12),
    )
    def check(vals, k):
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = [
            (r["kmv_pos"], r["kmv_hash"])
            for r in kmv_sketch(df, "v", k=k, seed=1).collect()
        ]
        hs = sorted({phash(f"{v}#1") for v in vals})[:k]
        assert sorted(got) == [(i + 1, h) for i, h in enumerate(hs)]
        if len({*vals}) < k:
            est = kmv_estimate(
                kmv_sketch(df, "v", k=k, seed=1), k=k
            ).collect()[0]
            assert est["est_distinct"] == len({phash(f"{v}#1") for v in vals})

    check()


def test_histogram_partition_property(spark):
    """For arbitrary int64 multisets and bucket counts: counts sum to
    n, every value lies inside its bucket's inclusive range, and the
    occupied buckets' ranges are disjoint and ordered."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        value_histogram,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-10**9, max_value=10**9),
            min_size=1, max_size=50,
        ),
        st.integers(min_value=1, max_value=16),
    )
    def check(vals, nb):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        rows = value_histogram(df, "x", n_buckets=nb).collect()
        assert sum(r["cnt"] for r in rows) == len(vals)
        mn, mx = min(vals), max(vals)
        width = mx - mn + 1
        by_bucket = {r["bucket"]: r for r in rows}
        for v in vals:
            b = (v - mn) * nb // width
            r = by_bucket[b]
            assert r["lo_fp"] <= v <= r["hi_fp"], (v, dict(r.asDict()))
        ordered = sorted(rows, key=lambda r: r["bucket"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["hi_fp"] < b["lo_fp"]

    check()


def test_interval_overlap_matches_bruteforce(spark):
    """For arbitrary interval sets and bucket widths, the bucketized
    join returns EXACTLY the brute-force overlap pairs, once each,
    with exact intersection bounds."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import (
        interval_overlap_join,
    )

    iv = st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=60),
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(iv, min_size=1, max_size=12),
        st.lists(iv, min_size=1, max_size=12),
        st.integers(min_value=1, max_value=40),
    )
    def check(ls, rs, bucket):
        left = spark.createDataFrame(
            [(i, s, s + d) for i, (s, d) in enumerate(ls)],
            "lid long, ls long, le long",
        )
        right = spark.createDataFrame(
            [(i, s, s + d) for i, (s, d) in enumerate(rs)],
            "rid long, rs long, re long",
        )
        got = sorted(
            (r["lid"], r["rid"], r["overlap_start"], r["overlap_end"])
            for r in interval_overlap_join(
                left, right,
                left_id="lid", left_start="ls", left_end="le",
                right_id="rid", right_start="rs", right_end="re",
                bucket=bucket,
            ).collect()
        )
        want = sorted(
            (i, j, max(s1, s2), min(e1, e2))
            for i, (s1, d1) in enumerate(ls)
            for j, (s2, d2) in enumerate(rs)
            for e1 in [s1 + d1]
            for e2 in [s2 + d2]
            if s1 <= e2 and s2 <= e1
        )
        assert got == want

    check()


def test_dag_family_cycle_guard_property(spark):
    """VERDICT r12 #8: random near-DAG digraphs — cyclic input must
    RAISE loudly from dag_longest_path and topological_order (never
    silently wrong levels); acyclic input must match the brute-force
    longest path and yield a rank order every edge ascends."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        dag_longest_path,
        topological_order,
    )

    edge = st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    )

    def is_cyclic(pairs):
        adj = {}
        for s, t in pairs:
            adj.setdefault(s, set()).add(t)
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for p in pairs for n in p}

        def dfs(u):
            color[u] = GRAY
            for v in adj.get(u, ()):
                if color[v] == GRAY or (color[v] == WHITE and dfs(v)):
                    return True
            color[u] = BLACK
            return False

        return any(color[n] == WHITE and dfs(n) for n in list(color))

    def brute_levels(pairs):
        nodes = {n for p in pairs for n in p}
        lv = {n: 0 for n in nodes}
        for _ in range(len(nodes) + 1):
            changed = False
            for s, t in pairs:
                if lv[s] + 1 > lv[t]:
                    lv[t] = lv[s] + 1
                    changed = True
            if not changed:
                break
        return lv

    @settings(max_examples=6, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=12, unique=True))
    def check(pairs):
        df = spark.createDataFrame(
            pairs, "sourceNodeId long, targetNodeId long"
        )
        if is_cyclic(pairs):
            try:
                dag_longest_path(df, max_iter=24).collect()
                raise AssertionError(
                    f"cycle {pairs} must raise, not return levels"
                )
            except RuntimeError:
                pass
            try:
                topological_order(df, max_iter=24).collect()
                raise AssertionError(f"cycle {pairs} must raise in topo")
            except RuntimeError:
                pass
        else:
            got = {
                r["nodeId"]: r["level"]
                for r in dag_longest_path(df, max_iter=24).collect()
            }
            assert got == brute_levels(pairs), pairs
            ranks = {
                r["nodeId"]: r["topo_rank"]
                for r in topological_order(df, max_iter=24).collect()
            }
            for s, t in pairs:
                assert ranks[s] < ranks[t], (pairs, ranks)

    check()


def test_cc_incremental_random_deltas_match_full_recompute(spark):
    """VERDICT r12 #8: random delta batches (self-loops, cycles,
    brand-new nodes, already-merged edges) folded into a prior
    labeling must be bit-identical to the brute-force union-find over
    base ∪ delta — min-of-mins exactness under arbitrary deltas."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        connected_components_incremental,
    )

    edge = st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    )

    def uf_labels(pairs, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, t in pairs:
            rs, rt = find(s), find(t)
            if rs != rt:
                parent[max(rs, rt)] = min(rs, rt)
        return {n: find(n) for n in nodes}

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(edge, min_size=1, max_size=10, unique=True),
        st.lists(edge, min_size=1, max_size=8, unique=True),
    )
    def check(base, delta):
        base_nodes = sorted({n for p in base for n in p})
        old = uf_labels(base, base_nodes)
        old_df = spark.createDataFrame(
            list(old.items()), "nodeId long, component long"
        )
        delta_df = spark.createDataFrame(
            delta, "sourceNodeId long, targetNodeId long"
        )
        got = {
            r["nodeId"]: r["component"]
            for r in connected_components_incremental(
                old_df, delta_df
            ).collect()
        }
        all_nodes = sorted(
            set(base_nodes) | {n for p in delta for n in p}
        )
        assert got == uf_labels(base + delta, all_nodes), (base, delta)

    check()


def test_batched_quantiles_property(spark):
    """r13 batched narrowing engine: for random multisets, weights and
    quantile lists (duplicates-heavy, narrowing forced), every rank —
    plain, weighted, grouped, grouped-weighted — equals brute force."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles,
        exact_quantiles_grouped,
        exact_weighted_quantiles,
        exact_weighted_quantiles_grouped,
    )

    @settings(max_examples=4, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from("pq"),
                st.integers(min_value=0, max_value=15),  # heavy dups
                st.integers(min_value=1, max_value=4),
            ),
            min_size=5,
            max_size=60,
        ),
        st.lists(
            st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
            min_size=1,
            max_size=4,
            unique=True,
        ),
    )
    def check(rows, qs):
        df = spark.createDataFrame(rows, "g string, v long, w long")

        def brute(vals, q):
            vals = sorted(vals)
            return vals[int((len(vals) - 1) * q)]

        allv = [v for _, v, _ in rows]
        allw = [v for _, v, w in rows for _ in range(w)]
        got = {
            r["quantile"]: r["value"]
            for r in exact_quantiles(
                df, "v", qs, local_threshold=4, n_buckets=4
            ).collect()
        }
        assert got == {q: brute(allv, q) for q in qs}
        gotw = {
            r["quantile"]: r["value"]
            for r in exact_weighted_quantiles(
                df, "v", "w", qs, local_threshold=4, n_buckets=4
            ).collect()
        }
        assert gotw == {q: brute(allw, q) for q in qs}
        by = {"p": [], "q": []}
        byw = {"p": [], "q": []}
        for g, v, w in rows:
            by[g].append(v)
            byw[g].extend([v] * w)
        gg = {
            (r["g"], r["quantile"]): r["value"]
            for r in exact_quantiles_grouped(
                df, "g", "v", qs, local_threshold=4, n_buckets=4
            ).collect()
        }
        expect = {
            (g, q): brute(vs, q)
            for g, vs in by.items()
            if vs
            for q in qs
        }
        assert gg == expect
        ggw = {
            (r["g"], r["quantile"]): r["value"]
            for r in exact_weighted_quantiles_grouped(
                df, "g", "v", "w", qs, local_threshold=4, n_buckets=4
            ).collect()
        }
        expectw = {
            (g, q): brute(vs, q)
            for g, vs in byw.items()
            if vs
            for q in qs
        }
        assert ggw == expectw

    check()


def test_mst_matches_kruskal_property(spark):
    """r14: arbitrary small weighted multigraphs (self-loops, parallel
    edges with conflicting weights, disconnected pieces, weight ties)
    — Borůvka under the (w, u, v) total order must equal sequential
    Kruskal under the same order, edge for edge (the forest is unique
    under a total order, so equality is exact set equality)."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.mst import (
        minimum_spanning_forest,
    )

    wedge = st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=1, max_value=5),
    )

    def kruskal(triples):
        best = {}
        for u, v, w in triples:
            if u == v:
                continue
            a, b = min(u, v), max(u, v)
            if (a, b) not in best or w < best[(a, b)]:
                best[(a, b)] = w
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for (u, v), w in sorted(
            best.items(), key=lambda kv: (kv[1], kv[0])
        ):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                out.append((u, v, w))
        return sorted(out)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(wedge, min_size=1, max_size=14))
    def check(triples):
        df = spark.createDataFrame(
            triples, "sourceNodeId long, targetNodeId long, weight long"
        )
        got = sorted(
            (r["edge_u"], r["edge_v"], r["weight"])
            for r in minimum_spanning_forest(df).collect()
        )
        assert got == kruskal(triples), triples

    check()


def test_pareto_nd_matches_bruteforce_property(spark):
    """r14: arbitrary small 3-d point multisets (duplicates, total
    ties, degenerate constant dims) — the local-then-merge skyline
    must equal the O(n²) dominance definition exactly, duplicates
    kept."""
    from hypothesis import given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    point = st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=4),
    )

    def brute(points):
        def dom(a, b):
            return all(x >= y for x, y in zip(a, b)) and any(
                x > y for x, y in zip(a, b)
            )

        return sorted(
            p for p in points if not any(dom(q, p) for q in points)
        )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(point, min_size=1, max_size=20))
    def check(points):
        df = spark.createDataFrame(points, "a int, b int, c int")
        got = sorted(
            (r["a"], r["b"], r["c"])
            for r in pareto_frontier_nd(
                df, ["a", "b", "c"], local_keep_cap=4
            ).collect()
        )
        assert got == brute(points), points

    check()
