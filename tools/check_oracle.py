"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compare row count / columns / order-insensitive
values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from webhookdb_spark.session import get_spark


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


#: DuckDB types with NO faithful pandas dtype: the driver fetches the
#: oracle through pandas, where these render float64 (HUGEINT/UHUGEINT
#: always; UBIGINT for values > 2^63 falls back to object/float on
#: overflowing paths), so byte-identical values hash-mismatch against
#: Spark's integer rendering ('1364.0' vs '1364') — the mixture_plan
#: r9-r10 seam (ABBENCH_r11 §4). Any oracle projecting one must cast
#: (BIGINT for counts/sums, DOUBLE only if the Spark side is double).
PANDAS_UNFAITHFUL_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT")


def unfaithful_columns(con, sql: str) -> list[tuple[str, str]]:
    """(column, type) pairs of ``sql``'s projection whose DuckDB type
    cannot round-trip the driver's pandas fetch — the DESCRIBE sweep
    both tools/check_oracle.py and tests/test_oracle_parity.py run."""
    cols = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [
        (c, ty) for c, ty, *_ in cols
        if any(t in ty.upper() for t in PANDAS_UNFAITHFUL_TYPES)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        # Emulate the DRIVER's pandas canonicalization (the r7 err
        # class: 9999-12-31 overflows pandas ns-timestamps; array
        # columns are unhashable in the pandas sort). A query that
        # passes the tuple-canon below but dies here will still err on
        # the official record, so it fails here too.
        try:
            import pandas as pd

            pdf = pd.DataFrame(srows, columns=scols)
            for c in pdf.columns:
                if pdf[c].dtype == object and len(pdf) and isinstance(
                    pdf[c].iloc[0], __import__("datetime").datetime
                ):
                    pdf[c] = pd.to_datetime(pdf[c])
            pdf.sort_values(by=sorted(scols), inplace=True)
        except Exception as e:
            print(
                f"FAIL {name}: driver-canon error "
                f"{type(e).__name__}: {str(e)[:200]}"
            )
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            bad_types = unfaithful_columns(con, oracles[name])
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if bad_types:
            print(
                f"FAIL {name}: oracle projects pandas-unfaithful "
                f"type(s) {bad_types} — cast in the SQL twin"
            )
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            a, b = canon(srows, scols), canon(orows, ocols)
            if a != b:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ at sorted row {diff}: {a[diff] if diff is not None else '?'} vs {b[diff] if diff is not None else '?'}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    # machine-checkable trailer: progress-bar carriage returns can glue
    # onto per-query lines when stderr is merged in, so a sweep
    # post-processor must be able to detect swallowed lines by count
    n_run = len([n for n in qs if not only or n in only])
    print(f"SWEEP {n_run - failures} ok / {failures} fail / {n_run} run",
          flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
