"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall times.

Each query is materialized via a count-ish action (noop write would hide
collect cost; .count() after a cache-free run measures the full plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "4.0"))


def _wait_for_quiet_box(
    threshold: float = LOAD_GATE, max_wait_sec: float = 600.0
) -> float:
    """Wait (bounded) for the 1-minute loadavg to fall under ``threshold``
    before timing anything. The r6 driver bench regressed a uniform
    ~1.32× across 112 queries with ZERO code changes — the signature of a
    busy box — and the artifact gave no way to tell. Now the bench (a)
    refuses to start hot while the box is busy, up to 10 minutes, and
    (b) records the loadavg it actually started at in both JSON outputs
    so an environmental regression is diagnosable from the artifact."""
    deadline = time.time() + max_wait_sec
    load = os.getloadavg()[0]
    while load > threshold and time.time() < deadline:
        print(
            f"bench: 1m loadavg {load:.1f} > {threshold} — waiting for a "
            f"quiet box ({int(deadline - time.time())}s left)",
            file=sys.stderr,
        )
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def _time_query(fn, spark, sf_dir: str, runs: int) -> float:
    """Hot best-of-N wall time for one registered query (page cache + JIT
    warm across the N runs)."""
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    start_load = _wait_for_quiet_box()
    import __spark_entry__ as e
    from incubator_stormcrawler_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    loads: dict[str, float] = {}
    loads_after: dict[str, float] = {}
    import gc

    # Per-query load gating (r7 fix, refined r8): the r6 AND r7 driver
    # artifacts were both load-tainted — the start gate passed, then the
    # box got busy MID-RUN and inflated the tail queries (r7: start 3.94,
    # end 11.27). Every query samples the 1-minute loadavg immediately
    # BEFORE its timing runs; a query whose pre-sample exceeds the gate
    # is quiet-waited and re-run ONCE, the retry kept only if cleaner —
    # one external load spike costs one bounded wait, not a tainted
    # artifact. The PRE-sample is the contamination signal: queries run
    # back-to-back, so sustained external load (the r6/r7 failure mode)
    # shows in the next pre-sample within a minute. The POST-sample is
    # recorded for diagnostics but deliberately NOT gated on — a
    # 32-thread iterative stage (PageRank, k-core) legitimately drives
    # its OWN 1m loadavg past any reasonable gate (measured 5.4 on
    # link_trustrank with a 0.07-idle box), and re-running self-load is
    # a no-op that only doubles bench time. Summary carries max_load_1m
    # over pre-samples (the cleanliness claim) and max_load_1m_incl_self
    # over all samples; the detail file has both per query.
    #
    # r9 advisory (post-sample spike detection): a spike that BEGINS
    # mid-query — especially on the last query — taints that timing
    # while every pre-sample stays clean, so "0 hot queries" alone can
    # overclaim. The 1m loadavg relaxes toward instantaneous load with a
    # 60 s time constant, so over a query of wall time t the query's OWN
    # full-burn contribution is bounded by ncpu·(1 − e^(−t/60)); a
    # post-sample above pre + that bound (+ the gate's headroom) cannot
    # be self-load and is counted in n_post_hot_queries — advisory only
    # (no retry: the next query's PRE-sample gate already handles
    # sustained load), but a nonzero value flags the artifact.
    import math
    import multiprocessing

    ncpu = float(os.environ.get(
        "SPARK_GRAFT_CPUS", multiprocessing.cpu_count()))
    post_hot: list[str] = []
    for name, fn in e.queries().items():
        try:
            q_load = None
            for attempt in range(2):
                load0 = os.getloadavg()[0]
                if load0 > LOAD_GATE:
                    load0 = _wait_for_quiet_box(max_wait_sec=120.0)
                t_wall0 = time.time()
                best = _time_query(fn, spark, sf_dir, runs)
                elapsed = time.time() - t_wall0
                load1 = os.getloadavg()[0]
                self_ceiling = load0 + ncpu * (
                    1.0 - math.exp(-elapsed / 60.0))
                if load1 > max(LOAD_GATE, self_ceiling) and name not in post_hot:
                    post_hot.append(name)
                    print(
                        f"bench: {name} post-load {load1:.1f} exceeds "
                        f"self-load ceiling {self_ceiling:.1f} — external "
                        "spike began mid-query (advisory)",
                        file=sys.stderr,
                    )
                if q_load is None or load0 < q_load:
                    q_load, timings[name] = load0, round(best, 3)
                    loads_after[name] = round(load1, 2)
                if load0 <= LOAD_GATE:
                    break
                print(
                    f"bench: {name} STARTED at 1m load {load0:.1f} > "
                    f"{LOAD_GATE} — {'re-running once' if attempt == 0 else 'keeping cleaner attempt'}",
                    file=sys.stderr,
                )
            loads[name] = round(q_load, 2)
        except Exception as ex:  # a failing query gets a sentinel, not a crash
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            # only install the sentinel when NO attempt recorded a timing:
            # a hot attempt 0 may have measured fine and only the load-gate
            # RETRY failed — that valid measurement must survive
            if name not in timings:
                timings[name] = -1.0
                loads[name] = round(os.getloadavg()[0], 2)
            elif name not in loads:
                # attempt 0 measured fine; record its load sample
                loads[name] = round(q_load, 2)
        # Release per-query executor state: some operators cache() or
        # localCheckpoint() intermediates (edge lists, signatures,
        # centroids) that only the query's own lineage references. Left
        # alone, 69 queries × best-of-2 accumulate hundreds of MB of dead
        # blocks in the single local JVM and the LAST benchmarks (8 M-row
        # baselines) pay for it in spills — measured 8× on the 8 M
        # frontier window after the round-4 registry grew. clearCache
        # drops named caches; the gc.collect() releases the Python
        # DataFrame wrappers so the ContextCleaner can reap checkpoint
        # RDDs.
        spark.catalog.clearCache()
        gc.collect()
    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # BASELINE.md operator workloads (frontier/merge vs DuckDB, normalize +
    # parse throughput) — skippable via SPARK_GRAFT_SKIP_BASELINES=1.
    baselines = {}
    if not os.environ.get("SPARK_GRAFT_SKIP_BASELINES"):
        try:
            from tools.baseline_bench import run_baselines

            baselines = run_baselines(spark)
        except Exception as ex:
            print(f"baseline bench error: {ex}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver keeps only a bounded (~2 KB) TAIL of stdout and parses the
    # final JSON line. With 90+ queries the per-query map alone is ~3.5 KB,
    # so embedding it in the final line pushes the line's HEAD (metric,
    # total) out of the capture window — BENCH_r04 parsed null for exactly
    # that reason (r01 had the same failure from the baselines map). So:
    # full detail goes to a repo file + stderr, and stdout ENDS with a
    # short summary-only line that always fits in the tail.
    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_loads_1m": loads,
        "query_loads_1m_after": loads_after,
        "sf": sf_val,
        "load_1m_at_start": round(start_load, 2),
        "load_1m_at_end": round(os.getloadavg()[0], 2),
        "max_load_1m": max(loads.values()) if loads else round(start_load, 2),
        "max_load_1m_incl_self": round(
            max(
                list(loads.values()) + list(loads_after.values())
                + [start_load]
            ),
            2,
        ),
        "load_gate": LOAD_GATE,
        "n_hot_queries": sum(1 for v in loads.values() if v > LOAD_GATE),
        "n_post_hot_queries": len(post_hot),
        "post_hot_queries": post_hot,
    }
    if baselines:
        print("baselines: " + json.dumps(baselines, separators=(",", ":")),
              file=sys.stderr)
    print("queries: " + json.dumps(timings, separators=(",", ":")),
          file=sys.stderr)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL_latest.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as ex:
        print(f"could not write {detail_path}: {ex}", file=sys.stderr)
    n_err = sum(1 for t in timings.values() if t < 0)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_errors": n_err,
                "load_1m_at_start": round(start_load, 2),
                "max_load_1m": detail["max_load_1m"],
                "n_hot_queries": detail["n_hot_queries"],
                "n_post_hot_queries": detail["n_post_hot_queries"],
                "detail_file": "BENCH_DETAIL_latest.json",
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
