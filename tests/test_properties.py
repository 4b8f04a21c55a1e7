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
