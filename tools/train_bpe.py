"""Train the tiny deterministic BPE merge table pinned in
webhookdb_spark/operators/text.py (BPE_MERGES).

Classic byte-pair-encoding training (Sennrich et al. 2016, public
algorithm) over the lowercase ASCII letter runs of the fixture corpus:

- words = every [a-z]+ run of the ascii-lowered document text, with
  frequencies (word-type weighted by count);
- each round merges the most frequent adjacent symbol pair (ties broken
  by lexicographically smallest pair, so training is deterministic);
- merge #k is assigned the single-character symbol chr(65 + k) ('A',
  'B', ...) — uppercase letters cannot collide with the lowercase base
  alphabet, which keeps every BPE unit exactly one character so merge
  application is plain string replace() in any engine.

Usage: python tools/train_bpe.py [n_merges] [parquet_path]
Prints the BPE_MERGES tuple ready to paste.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import duckdb


def train(n_merges: int, parquet: str) -> list[tuple[str, str]]:
    rows = duckdb.connect().execute(
        "SELECT translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        " 'abcdefghijklmnopqrstuvwxyz') FROM read_parquet(?)",
        [parquet],
    ).fetchall()
    words: Counter[str] = Counter()
    for (text,) in rows:
        words.update(re.findall(r"[a-z]+", text or ""))
    merges: list[tuple[str, str]] = []
    vocab = dict(words)
    for k in range(n_merges):
        pairs: Counter[str] = Counter()
        for w, n in vocab.items():
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += n
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        sym = chr(65 + k)
        merges.append((best, sym))
        merged: Counter[str] = Counter()
        for w, n in vocab.items():
            merged[w.replace(best, sym)] += n
        vocab = dict(merged)
    return merges


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    path = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01/documents.parquet"
    ms = train(n, path)
    print("BPE_MERGES = (")
    for pair, sym in ms:
        print(f"    ({pair!r}, {sym!r}),")
    print(")")
