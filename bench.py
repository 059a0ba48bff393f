"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect overhead), which is how throughput would be measured on
a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from webhookdb_spark.session import get_spark

# Queries excluded from the bench (none currently — every registered
# query, including the multiprobe LSH ANN and its recall self-check,
# carries an oracle and runs end-to-end).
SKIP: set[str] = set()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="webhookdb-spark-bench", cpus=cpus,
                      shuffle_partitions=cpus)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # Warm-up: a trivial action per table so JVM start, codegen
    # compilation, and file-listing are not billed to the first query.
    # (Cluster benchmarking convention: steady-state throughput, not
    # cold-start latency.)
    for t in entrymod.TABLES:
        entrymod.load(spark, sf_dir, t).count()
    # spin up the Python/Arrow worker pool so the first pandas-UDF
    # query isn't billed for it
    spark.range(8).mapInPandas(lambda it: it, "id long").count()

    # Steady-state timing: each query runs at least twice and reports
    # the min — the first execution pays one-off whole-stage-codegen
    # compilation and host noise that a cluster's sustained throughput
    # never sees. The host's I/O jitter is lumpy (multi-second straggler
    # spikes on otherwise-identical runs), so when the two fastest runs
    # still disagree by >25% the query re-runs (up to 4 total) until the
    # min is corroborated — otherwise a single anomaly window inflates
    # the recorded number by 3-4x.
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if name in SKIP:
            continue
        runs: list[float] = []
        while True:
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            if len(runs) >= 2:
                best, second = sorted(runs)[:2]
                if second <= best * 1.25 or len(runs) >= 4:
                    break
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
