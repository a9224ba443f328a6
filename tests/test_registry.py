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


def test_seeded_constants_flip_stays_green(spark):
    """The anti-overfitting contract: flipping ROUND_SEED re-points a
    seeded query AND its oracle at fresh constants and the pair must STILL
    agree — proving the parameterized operator, not one memorized tuple.
    Runs two seeded TPC-H shapes at two non-committed seeds, rebuilding
    the oracle SQL from the flipped dict exactly as oracle_sql() does.
    (Trial seeds stay ahead of the committed ROUND_SEED: 9 became the
    committed seed in r9, so the trials moved to 10/17.)"""
    import duckdb

    from incubator_stormcrawler_spark import roundparams as rp
    from incubator_stormcrawler_spark.operators import relational as rel

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    saved = dict(rp.RP)
    try:
        for trial_seed in (10, 17):
            rp.RP.clear()
            rp.RP.update(rp.round_params(trial_seed))
            P = rp.RP
            # Q6: dates + float bounds + int threshold
            got = rel.forecast_revenue(spark, sf).collect()[0].revenue
            exp = con.sql(f"""
                SELECT round(sum(l_extendedprice * l_discount), 2)
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '{P['q6_start']} 00:00:00'
                  AND l_shipdate < TIMESTAMP '{P['q6_end']} 00:00:00'
                  AND l_discount BETWEEN {P['q6_disc_lo']}
                                     AND {P['q6_disc_hi']}
                  AND l_quantity < {P['q6_qty']}
            """).fetchone()[0]
            assert got == exp, (trial_seed, got, exp)
            # Q18: seeded integer HAVING threshold through a join
            rows = {
                (r.o_orderkey, r.total_qty)
                for r in rel.large_volume_customers(spark, sf).collect()
            }
            exp_rows = set(con.sql(f"""
                SELECT o_orderkey, CAST(total_qty AS BIGINT)
                FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
                      FROM lineitem GROUP BY l_orderkey
                      HAVING sum(l_quantity) > {P['q18_qty']})
                JOIN orders ON o_orderkey = l_orderkey
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
            """).fetchall())
            assert rows == exp_rows, trial_seed
    finally:
        rp.RP.clear()
        rp.RP.update(saved)


def test_no_array_or_map_output_columns(spark):
    """The driver's oracle comparator pandas-sorts EVERY output column;
    a top-level ARRAY or MAP cell raises `unhashable type: 'list'` and
    the row errors without ever comparing values — exactly how
    embedding_random_projection became the only ungraded query in r8
    (CORRECTNESS_r08.json). Schema inspection is lazy (plan analysis
    only, nothing executes), so this sweeps the whole registry cheaply:
    any query returning nested top-level columns must posexplode (or
    emit per-component scalars) BEFORE registration."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    bad: dict[str, list[str]] = {}
    for name, q in e.queries().items():
        schema = q(spark, sf_dir).schema
        nested = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            bad[name] = nested
    assert bad == {}, (
        f"registered queries with driver-uncanonicalizable output "
        f"columns: {bad}"
    )
