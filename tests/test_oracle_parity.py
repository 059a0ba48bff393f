"""Driver-contract parity: run every ``queries()`` entry AND its
``oracle_sql()`` twin at sf0.001 and compare canonicalized results —
the same check the driver performs at sf0.01, run locally so a contract
break (column rename, rounding drift, un-hashable output shape) fails
in pytest before it costs a CORRECTNESS row.

Canonicalization mirrors the driver: sort columns by name, sort rows by
all columns, then compare values (exact for ints/strings, 1e-9 relative
for floats). A column the driver's pandas sort cannot factorize (lists,
dicts) is itself a failure here — that is exactly the media_features
r1 regression shape.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# Approximate operators with rows-only driver checks: parity here is
# row-count presence, not value equality.
ROWS_ONLY = {name for name in E.queries() if name not in E.oracle_sql()}


def _canon(rows, cols):
    """Sort columns by name, then rows by all values (None-safe)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def _eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _type_class(ty: str) -> str:
    """Coarse type family for Spark/DuckDB cross-engine schema parity:
    an int column on one side rendered float on the other ('1364' vs
    '1364.0') hash-mismatches on identical values — the mixture_plan
    r9-r10 driver seam (HUGEINT → pandas float64)."""
    ty = ty.upper()
    if "DECIMAL" in ty:
        return "decimal"
    if any(k in ty for k in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if "INT" in ty or ty in ("LONG", "SHORT", "BYTE"):
        return "int"
    if "BOOL" in ty:
        return "bool"
    if "TIMESTAMP" in ty:
        return "ts"
    if "DATE" in ty:
        return "date"
    if any(k in ty for k in ("VARCHAR", "STRING", "TEXT", "CHAR")):
        return "str"
    return ty


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_matches_oracle(spark, oracle, name):
    sdf = E.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name in ROWS_ONLY:
        assert srows is not None  # ran and produced a stable collect
        return
    cur = oracle.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), "column names must match"
    sklass = {f.name: _type_class(f.dataType.simpleString())
              for f in sdf.schema.fields}
    oklass = {c: _type_class(ty) for c, ty, *_ in
              oracle.execute(f"DESCRIBE ({E.oracle_sql()[name]})").fetchall()}
    drift = {c: (sklass[c], oklass[c]) for c in sklass
             if sklass[c] != oklass[c]}
    assert not drift, f"type-class drift (hash-render hazard): {drift}"
    assert len(srows) == len(orows), f"row count {len(srows)} vs oracle {len(orows)}"

    _, s = _canon(srows, sdf.columns)
    _, o = _canon(orows, ocols)
    bad = [
        (i, sv, ov)
        for i, (sv, ov) in enumerate(zip(s, o))
        if not all(_eq(a, b) for a, b in zip(sv, ov))
    ]
    assert not bad, f"{len(bad)} mismatched rows; first: {bad[0]}"


def test_no_oracle_projects_pandas_unfaithful_types(oracle):
    """No oracle may project a column of a DuckDB type with no
    faithful pandas dtype — HUGEINT/UHUGEINT (int128, always
    float64-rendered) and UBIGINT (values > 2^63 cannot land in
    int64) — because the DRIVER fetches oracles through pandas, where
    such columns render '1364.0' against Spark's '1364' and
    byte-identical values hash-mismatch. This exact class was the sole
    two-round driver red (`mixture_plan`, r9-r10: rows/schema green,
    hash red, every arithmetic theory disproven — ABBENCH_r11 §4).
    Cast in the SQL twin (BIGINT for integer sums/counts). The type
    blacklist and the DESCRIBE sweep are shared with the driver
    stand-in (tools/check_oracle.py), so the tool's fetch path
    enforces the same gate."""
    from tools.check_oracle import unfaithful_columns

    offenders = {}
    for name, sql in sorted(E.oracle_sql().items()):
        bad = unfaithful_columns(oracle, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
