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


def _green_rows(path: str) -> set[str]:
    """Names whose driver row is fully green (not merely present)."""
    rows = json.load(open(path))
    return {
        k for k, v in rows.items()
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    }


def test_driver_window_tail_is_driver_green():
    """Every entry past position 50 must have a GREEN row in SOME prior
    driver round — otherwise a query exists that NO driver round has ever
    correctness-checked, or one whose only driver row is a failure.
    Membership alone is not enough: a failing row would satisfy a key-set
    check while the query stays driver-red forever. The green set is the
    union over ALL committed CORRECTNESS_r*.json files (r7 fix: the
    source list grows with rounds instead of hardcoding r03|r04)."""
    import glob

    import __spark_entry__ as e

    green: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        green |= _green_rows(path)
    ks = list(e.queries())
    unchecked_tail = [k for k in ks[50:] if k not in green]
    assert unchecked_tail == [], (
        f"queries past the driver's 50-entry gate with no prior GREEN "
        f"correctness row: {unchecked_tail}"
    )


def test_no_hugeint_oracle_columns():
    """DuckDB types sum(BIGINT) as HUGEINT, which the driver's
    pandas/Arrow canonicalization renders as float64 ("540.0" vs Spark's
    "540") — a guaranteed hash mismatch on value-identical results (the
    entire r04 46/50 gap). DESCRIBE plans each oracle against the
    registered views without executing it, so this sweep is cheap and
    catches the whole class mechanically."""
    import duckdb

    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[str]] = {}
    for name, sql in e.oracle_sql().items():
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        # DECIMAL is the same class of trap: pandas fetches it as
        # decimal.Decimal objects whose str() ("540.00") diverges from
        # Spark's double rendering — cast to DOUBLE or BIGINT instead
        risky = [
            f"{r[0]}:{r[1]}" for r in desc
            if str(r[1]).upper() in ("HUGEINT", "UHUGEINT")
            or str(r[1]).upper().startswith("DECIMAL")
        ]
        if risky:
            bad[name] = risky
    assert bad == {}, f"oracles with driver-incompatible output types: {bad}"


def test_no_duplicate_registry_keys():
    import __spark_entry__ as e

    ks = list(e.queries())
    assert len(ks) == len(set(ks))
