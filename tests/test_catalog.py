"""Catalog registry invariants — the driver contract's structural health."""

import dataflow_flex_pyarrow_to_gds_spark.queries as C

#: round 2: every catalog query is oracled — the approximate family got
#: structural/exhaustive oracles (portable-hash simhash, recall-1.0-tuned
#: ANN vs exact top-k, sketch-vs-exact tolerance booleans)
ALLOWED_ROWS_ONLY: set[str] = set()


def test_no_orphan_oracles():
    """Every oracle string must belong to a registered query (an orphan
    means a rename silently downgraded a query to rows-only)."""
    specs = C._specs()
    all_oracles = {
        **C._GRAPH_ORACLES,
        **C._RELATIONAL_ORACLES,
        **C._extension_oracles(),
    }
    assert set(all_oracles) <= set(specs), set(all_oracles) - set(specs)


def test_rows_only_set_is_intentional():
    specs = C._specs()
    rows_only = {n for n, s in specs.items() if not s.oracle}
    assert rows_only == ALLOWED_ROWS_ONLY, rows_only ^ ALLOWED_ROWS_ONLY


def test_every_query_documented():
    for name, spec in C._specs().items():
        assert spec.doc.strip(), f"{name} has no docstring"


def test_driver_window_covers_unverified_queries():
    """The driver's correctness gate only checks the first DRIVER_WINDOW
    entries of queries() (dict order). Every query WITHOUT a prior
    driver-green row must sit inside that window; only queries frozen in
    PREVIOUSLY_DRIVER_VERIFIED may sit beyond it."""
    names = list(C.queries())
    window = set(names[: C.DRIVER_WINDOW])
    beyond = set(names[C.DRIVER_WINDOW :])
    assert beyond <= C.PREVIOUSLY_DRIVER_VERIFIED, (
        beyond - C.PREVIOUSLY_DRIVER_VERIFIED
    )
    # a frozen name that drifted back inside the window is fine; a frozen
    # name missing entirely means a rename broke the union-coverage claim
    assert C.PREVIOUSLY_DRIVER_VERIFIED <= set(names)


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_clear_co_order_memo(spark):
    """ADVICE r10: the co-order memo exposes an eviction hook for
    long-lived multi-corpus sessions — entries drop (per-corpus or all)
    and re-derive on next use."""
    from dataflow_flex_pyarrow_to_gds_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    Q._co_order_edges(spark, sf)            # populate
    assert any(k[1] == sf for k in Q._CO_ORDER_MEMO)
    n = Q.clear_co_order_memo(sf_dir=sf)
    assert n >= 1
    assert not any(k[1] == sf for k in Q._CO_ORDER_MEMO)
    e = Q._co_order_edges(spark, sf)        # re-derives cleanly
    assert e.count() > 0
    assert Q.clear_co_order_memo() >= 1     # full clear
    assert not Q._CO_ORDER_MEMO
