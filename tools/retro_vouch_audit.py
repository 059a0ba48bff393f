"""Historical vouch audit: prove no query's vouched driver row predates
a change to the code that query actually runs.

``tools/rotation_audit.py`` checks the CURRENT tree against the stored
fingerprint record, which is sufficient going forward — but when the
fingerprint *algorithm* itself gains coverage (as the v3 module-alias
fix did), vouches recorded under the weaker algorithm may be stale in
a way the current-tree check cannot see: the code changed in some past
round, the old algorithm never noticed, and the fingerprint file was
regenerated since. This tool closes that gap by recomputing
fingerprints with the CURRENT algorithm at each round-close tree and
comparing every query's fingerprint at its vouched round against HEAD.

For each round-close commit (``round N: verdict/advice/...``, the
commit that lands the driver's CORRECTNESS_r{N}.json — its tree is the
code the driver checked) it:

1. creates a temporary git worktree at that commit,
2. copies the CURRENT tools/rotation_audit.py in (so the comparison
   uses one algorithm throughout),
3. computes fingerprints in a subprocess whose sys.path points at the
   worktree,
4. reports every query whose vouched round's fingerprint differs from
   HEAD's — i.e. whose driver row vouches for code that is no longer
   the code.

Exit status 1 if any stale vouch is found. Remedy: ``--unvouch`` the
named queries in rotation_audit.py --update and front them in
``_ROTATION_PRIORITY`` so the driver re-checks them.

Usage: python tools/retro_vouch_audit.py [--rounds 9,10,11]
(default: every round that appears as some query's vouched round)
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_FP_CODE = """
import sys, json
sys.path.insert(0, {root!r}); sys.path.insert(0, {root!r} + "/tools")
import rotation_audit as RA
import __spark_entry__ as E
print(json.dumps(RA.compute_fingerprints(E)))
"""


def _fps_at(root: str) -> dict[str, str]:
    r = subprocess.run(
        [sys.executable, "-c", _FP_CODE.format(root=root)],
        capture_output=True, text=True, cwd=root, timeout=600,
    )
    if r.returncode:
        raise RuntimeError(f"fingerprint compute failed at {root}:\n"
                           f"{r.stderr[-2000:]}")
    return json.loads(r.stdout.splitlines()[-1])


def _round_commits() -> dict[int, str]:
    """{round: commit} for every ``round N: ...`` record commit."""
    out = subprocess.run(
        ["git", "log", "--all", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    ).stdout
    commits: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        # Match every documented round-close subject form — the
        # records have shipped as "round N: verdict/advice/..." with
        # varying tails (r14 ADVICE: the verdict-only match made a
        # differently-titled record commit silently unauditable).
        m = re.match(r"round (\d+): (verdict|advice|correctness|bench)",
                     subject)
        if m:
            commits.setdefault(int(m.group(1)), sha)
    return commits


def main() -> int:
    only: set[int] | None = None
    if len(sys.argv) > 2 and sys.argv[1] == "--rounds":
        only = {int(x) for x in sys.argv[2].split(",")}

    fp_file = json.loads((REPO / "tools" / "query_fingerprints.json").read_text())
    vouch = {q: e["vouched"] for q, e in fp_file["queries"].items()
             if e["vouched"] is not None}
    rounds = sorted({v for v in vouch.values() if only is None or v in only})
    commits = _round_commits()
    head_fps = _fps_at(str(REPO))

    stale: dict[str, int] = {}
    unauditable = 0
    for rnd in rounds:
        commit = commits.get(rnd)
        if commit is None:
            # r14 ADVICE: a round holding vouches that cannot be
            # located is an audit FAILURE, not a warning — exiting 0
            # here would vouch blind.
            n = sum(1 for v in vouch.values() if v == rnd)
            print(f"r{rnd}: NO round-close commit found — cannot audit "
                  f"{n} vouches (FAIL)")
            unauditable += n
            continue
        qs = sorted(q for q, v in vouch.items() if v == rnd)
        with tempfile.TemporaryDirectory(prefix=f"retro_r{rnd}_") as wt:
            subprocess.run(["git", "worktree", "add", "--detach", wt, commit],
                           cwd=REPO, capture_output=True, check=True)
            try:
                # one algorithm throughout: current audit code, old tree
                (Path(wt) / "tools" / "rotation_audit.py").write_text(
                    (REPO / "tools" / "rotation_audit.py").read_text())
                old_fps = _fps_at(wt)
            finally:
                subprocess.run(["git", "worktree", "remove", wt, "--force"],
                               cwd=REPO, capture_output=True)
        missing = [q for q in qs if q not in old_fps]
        mism = [q for q in qs if q in old_fps and old_fps[q] != head_fps.get(q)]
        print(f"r{rnd}@{commit[:7]}: {len(qs)} vouched, {len(mism)} stale"
              + (f", absent-then (vouch is wrong): {missing}" if missing else ""))
        for q in mism:
            stale[q] = rnd
        for q in missing:  # vouched at a round before it existed: stale too
            stale[q] = rnd

    if stale:
        print("STALE VOUCHES (code changed since the vouched driver row):")
        for q, rnd in sorted(stale.items()):
            print(f"  {q} (vouched r{rnd})")
        print("remedy: python tools/rotation_audit.py --update --unvouch "
              + " ".join(sorted(stale)) + "  and front them in "
              "_ROTATION_PRIORITY")
        return 1
    if unauditable:
        print(f"retro vouch audit: {unauditable} vouch(es) in rounds with "
              "no locatable round-close commit")
        return 1
    print("retro vouch audit: clean — every vouched fingerprint matches HEAD")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
