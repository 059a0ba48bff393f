"""Median-of-3 re-measure protocol for the slowest queries.

VERDICT r11 "What's wrong #1": three bench records (official + two
local) disagreed by ±20% on UNCHANGED code, and nothing in the record
could say which was host noise. This tool makes the reconciliation
mechanical: run the K slowest queries (ranked by the committed
quiet-host floors in BENCH_FLOORS.json) three times each, report the
per-query MEDIAN and its ratio to the floor, and write the result as
one JSON line. A median landing >2x its floor across three spaced runs
is a real regression; an official-record delta with a clean median here
is host variance, documented instead of adjudicated by archaeology.

Usage: python tools/bench_slowest.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SLOWEST_K (default 16).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from webhookdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = int(os.environ.get("SLOWEST_K", "16"))
    floors = json.loads((REPO / "BENCH_FLOORS.json").read_text())
    qfns = entrymod.queries()
    targets = [n for n, _ in sorted(floors.items(), key=lambda kv: -kv[1])
               if n in qfns][:k]

    spark = get_spark(app_name="webhookdb-spark-bench-slowest", cpus=cpus,
                      shuffle_partitions=cpus, commit_heap=True)
    for t in entrymod.TABLES:  # same warm-up discipline as bench.py
        entrymod.load(spark, sf_dir, t).count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()
    # Same JIT warm-up as bench.py (see bench.warm_jit docstring).
    import bench as benchmod

    benchmod.warm_jit(spark)

    def run_once(fn) -> float:
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    # Host-speed canary (r14): same fixed job as bench.py's — its
    # ratio to the committed "__canary__" floor is the session's host
    # factor. x_floor_hostnorm divides that factor out, so a query is
    # flagged only when it outruns the drift EVERY query shares.
    from bench import measure_canary  # repo root is on sys.path

    canary_sec = measure_canary(spark)
    canary_floor = floors.get("__canary__")
    host_factor = (
        round(canary_sec / canary_floor, 2) if canary_floor else None
    )

    # interleave the three passes (A B C, A B C, ...) so one noise
    # window cannot inflate all three samples of the same query
    samples: dict[str, list[float]] = {n: [] for n in targets}
    for _pass in range(3):
        for name in targets:
            samples[name].append(run_once(qfns[name]))

    report = {}
    for name in targets:
        med = round(statistics.median(samples[name]), 3)
        floor = floors.get(name)
        x = round(med / floor, 2) if floor else None
        report[name] = {
            "median": med,
            "runs": [round(s, 3) for s in samples[name]],
            "floor": floor,
            "x_floor": x,
            "x_floor_hostnorm": (
                round(x / host_factor, 2)
                if x is not None and host_factor else None
            ),
        }
    def _worst(r):
        # host-normalized ratio when the canary floor exists, raw
        # otherwise — the regression bar stays 2.0 either way
        return (r["x_floor_hostnorm"]
                if r["x_floor_hostnorm"] is not None else r["x_floor"])
    doc = {
        "metric": "slowest_k_median_of_3",
        "sf_dir": sf_dir,
        "k": k,
        "canary_sec": canary_sec,
        "canary_floor": canary_floor,
        "host_factor": host_factor,
        "queries": report,
        "regressions": sorted(
            n for n, r in report.items()
            if _worst(r) is not None and _worst(r) > 2.0
        ),
    }
    line = json.dumps(doc)
    print(line)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
