"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir on Spark AND its
``oracle_sql()`` twin on DuckDB, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Usage:

    python tools/verify_local.py [sf_dir] [query ...]

Set ``VERIFY_JSON_OUT=/path.json`` to also write a CORRECTNESS_r*.json-style
report covering EVERY query — the driver's own gate checks only the first 50
``queries()`` entries, so this artifact is the full-coverage record.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if v == int(v) and abs(v) < 1e15 else f"{v:.10g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from incubator_stormcrawler_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"spark: {ex}"[:300]}
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check) "
                  f"[{spark_t:.1f}s]")
            report[name] = {"rows_only": True, "spark_rows": len(srows),
                            "err": None}
            if len(srows) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            # Driver-compat guard: the driver canonicalizes oracle results
            # through pandas/Arrow, where DuckDB HUGEINT (the type of
            # sum(BIGINT)) becomes float64 — "540" hashes as "540.0" and the
            # row mismatches even though values are identical (the entire
            # r04 46/50 gap). fetchall() below returns Python ints and would
            # mask it, so fail mechanically on the TYPE.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle columns typed HUGEINT "
                      f"(driver-incompatible, cast to BIGINT): {huge}")
                report[name] = {"rows_match": False, "schema_match": False,
                                "hash_match": False,
                                "err": f"hugeint oracle cols: {huge}"}
                failures += 1
                continue
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"duckdb: {ex}"[:300]}
            failures += 1
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        sh = table_hash([c.lower() for c in scols], srows)
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
        }
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{spark_t:.1f}s]"
        )
        if not ok_hash and ok_rows and ok_cols:
            # show first few diffs
            sset = {"\x01".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i].lower())) for r in srows}
            dset = {"\x01".join(canon(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i])) for r in drows}
            for x in list(sset - dset)[:3]:
                print("   spark-only:", x.replace("\x01", " | ")[:200])
            for x in list(dset - sset)[:3]:
                print("   duck-only :", x.replace("\x01", " | ")[:200])
    out = os.environ.get("VERIFY_JSON_OUT")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {out} ({len(report)} queries)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
