"""Mechanical invariants of the queries() registry: the driver's
correctness gate checks only the FIRST 50 entries, so curation bugs here
silently drop queries out of verification. These tests make the curation
contract executable."""

from __future__ import annotations

import json


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o)


def test_driver_window_tail_is_r03_green():
    """Every entry past position 50 must already be green in
    CORRECTNESS_r03.json — otherwise a query exists that NO driver round
    has ever correctness-checked."""
    import __spark_entry__ as e

    r03 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    ks = list(e.queries())
    unchecked_tail = [k for k in ks[50:] if k not in r03]
    assert unchecked_tail == [], (
        f"queries past the driver's 50-entry gate with no prior "
        f"correctness row: {unchecked_tail}"
    )


def test_no_duplicate_registry_keys():
    import __spark_entry__ as e

    ks = list(e.queries())
    assert len(ks) == len(set(ks))
