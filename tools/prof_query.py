"""Isolate one registry query: warm the tables, run it N times through
the noop sink (same methodology as bench.py), print each wall time and
the min, and optionally dump .explain("formatted") to a file.

Usage:
    python tools/prof_query.py NAME [NAME...] [--runs 3] [--explain OUT]
        [--ui]

$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from webhookdb_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>.txt explain dumps")
    ap.add_argument("--ui", action="store_true")
    ap.add_argument("--jobs", action="store_true",
                    help="dump per-Spark-job wall times for the LAST run "
                         "of each query (implies --ui)")
    args = ap.parse_args()
    if args.jobs:
        args.ui = True

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "true"} if args.ui else None
    spark = get_spark(app_name="prof-query", cpus=cpus,
                      shuffle_partitions=cpus, extra_conf=extra,
                      commit_heap=True)
    for t in entrymod.TABLES:
        entrymod.load(spark, sf_dir, t).count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()
    # Same JIT warm-up as bench.py so isolated prof numbers are
    # comparable to in-bench readings (fresh JVM per prof invocation
    # otherwise re-pays tiered compilation the bench absorbed).
    import bench as benchmod

    benchmod.warm_jit(spark)

    def job_snapshot():
        import json
        import urllib.request

        base = "http://localhost:4040/api/v1/applications"
        apps = json.loads(urllib.request.urlopen(base).read())
        app_id = apps[0]["id"]
        return json.loads(
            urllib.request.urlopen(f"{base}/{app_id}/jobs?status=succeeded"
                                   ).read()
        )

    qfns = entrymod.queries()
    for name in args.names:
        fn = qfns[name]
        times = []
        for i in range(args.runs):
            if args.jobs and i == args.runs - 1:
                before_ids = {j["jobId"] for j in job_snapshot()}
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            if args.jobs and i == args.runs - 1:
                from datetime import datetime

                def ms(j, k):
                    return datetime.strptime(
                        j[k], "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()

                jobs = [j for j in job_snapshot()
                        if j["jobId"] not in before_ids]
                jobs.sort(key=lambda j: j["jobId"])
                print(f"--- {name}: {len(jobs)} jobs ---")
                for j in jobs:
                    dur = ms(j, "completionTime") - ms(j, "submissionTime")
                    desc = j["name"].split("\n")[0][:110]
                    print(f"  job {j['jobId']:>4} {dur:7.3f}s "
                          f"tasks={j['numTasks']:<4} {desc}")
        print(f"{name}: min={min(times):.3f}  runs="
              + " ".join(f"{t:.3f}" for t in times), flush=True)
        if args.explain:
            out = Path(args.explain)
            out.mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}.txt").write_text(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
