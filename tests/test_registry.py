"""Driver-contract registry invariants.

The driver's correctness harness checks only the FIRST 50 entries of
``queries()`` in insertion order (round-3 verdict), so ordering is
load-bearing: every query that has never earned a driver correctness
row must sit inside that window.
"""

from dataquality_cli_ray.entrypoints import build_oracles, build_queries


def test_registry_shape():
    q, o = build_queries(), build_oracles()
    # every oracle maps to a query; names match exactly (the driver's
    # compare joins on the key)
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # exact count: a silently-dropped duplicate dict key or an
    # accidental removal both change this (update when adding queries)
    assert len(q) == len(o) == 67


def test_driver_window_contains_flagship_and_new_queries():
    first50 = list(build_queries())[:50]
    # the flagship and the operators without multi-round driver history
    # must be driver-checked (see entrypoints.build_queries NOTE)
    for name in (
        "images_quality",
        "images_quality_aligned",
        "docs_neardup_filter",
        "embedding_semdedup",
        "docs_quality_lr",
        "docs_line_dedup",
        "docs_dsir_select",
    ):
        assert name in first50, name


def test_every_query_callable_importable():
    q = build_queries()
    for name, fn in q.items():
        assert callable(fn), name
