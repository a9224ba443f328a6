"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage:
    python tools/explain_dump.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (all
registered queries when none are named). The plan is captured from the
DataFrame the registry function returns — iterative operators may run
real fixture jobs during construction; that is the same work the bench
times, so the captured plan is the one the timed action executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from incubator_stormcrawler_spark.session import get_spark

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")

    reg = e.queries()
    if not names:
        names = list(reg)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in reg:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = reg[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # capture the failure in place of a plan
            plan = f"ERROR while building/explaining {name}: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
        )
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        print(
            f"{name}: exchanges={n_exch} python_nodes={n_py} "
            f"joins={','.join(joins) or '-'} -> {path}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
