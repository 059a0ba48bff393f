"""Scale-up generator: replicate a driver testdata directory K times with
FK-preserving key shifts, for scaling-ratio benchmarks above sf0.1
(/root/testdata is read-only and tops out at sf0.1).

Usage: python tools/make_scale_data.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/sfscale/sf1

Design notes (what makes the scale-up honest):
- Relational tables shift every key column by copy*stride, so join
  fan-out, key cardinality, and group counts scale like real data
  (region/nation are genuine dimensions and stay fixed).
- documents.text passes through a per-copy alphabet rotation, so each
  copy carries the ORIGINAL corpus's near-duplicate structure without
  being a near-duplicate of other copies — dedup candidate volume
  scales linearly, as it would with 10x more real documents. A naive
  10x copy would instead plant 45 cross-copy duplicate pairs per doc
  and blow up quadratically by construction.
- embeddings rotate by copy index for the same reason (a copy of every
  vector would hand each ANN query 9 planted exact neighbors).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

TABLES = {
    # table -> {column: stride} key shifts
    "customer": {"c_custkey": 20_000},
    "supplier": {"s_suppkey": 2_000},
    "part": {"p_partkey": 30_000},
    "orders": {"o_orderkey": 200_000, "o_custkey": 20_000},
    "lineitem": {"l_orderkey": 200_000, "l_partkey": 30_000, "l_suppkey": 2_000},
    "events": {"event_id": 200_000, "user_id": 2_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
DIMS = ("region", "nation")


def _copy_select(table: str, cols: list[str], src: str, i: int) -> str:
    shifts = TABLES[table]
    parts = []
    for c in cols:
        if c in shifts:
            parts.append(f"{c} + {i * shifts[c]} AS {c}")
        elif table == "documents" and c == "text" and i:
            rot = LOWER[i:] + LOWER[:i] + UPPER[i:] + UPPER[:i]
            parts.append(f"translate(text, '{LOWER}{UPPER}', '{rot}') AS text")
        elif table == "embeddings" and c == "embedding" and i:
            parts.append(
                f"list_concat(embedding[{i + 1}:], embedding[:{i}]) AS embedding"
            )
        else:
            parts.append(c)
    return f"SELECT {', '.join(parts)} FROM read_parquet('{src}/{table}.parquet')"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        union = "\nUNION ALL\n".join(_copy_select(t, cols, src, i) for i in range(k))
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
