"""Suite-gated rotation-staleness audit (tools/rotation_audit.py).

Goes red the moment a registry query is never-checked without being
registered in tools/rotation_debt.json, a needy (unchecked or
past-horizon) query is buried behind fresh ones, or the debt file
drifts from the tracked driver record. No SparkSession needed.
"""

import json
from pathlib import Path

from tools.rotation_audit import WINDOW, audit, load_record

REPO = Path(__file__).resolve().parent.parent


def test_rotation_invariant_holds():
    problems = audit()
    assert problems == [], "\n".join(problems)


def test_debt_fits_rotation_runway():
    """The never-checked backlog must clear within two driver rounds
    (2 * WINDOW slots) — the registry-growth freeze VERDICT r8 ordered."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries().keys())
    latest, _ = load_record()
    debt = set(
        json.loads((REPO / "tools" / "rotation_debt.json").read_text())
    )
    assert debt <= registry
    assert {q for q in registry if q not in latest} <= debt
    assert len(debt) <= 2 * WINDOW


def test_rotation_sorted_orders_needy_first():
    """The derived registry order (r10): priority re-checks lead, then
    never-checked (no tracked row), then stalest-first, registry
    source order as the tie-break — on a synthetic record, so the
    invariant is pinned independent of the repo's current state."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    base = {n: (lambda s, d: None) for n in
            ["fresh_a", "stale_b", "never_c", "prio_d", "stale_a"]}
    saved_record = entrymod._ROTATION_RECORD
    saved_prio = entrymod._ROTATION_PRIORITY
    try:
        entrymod._ROTATION_RECORD = {
            "fresh_a": 9, "stale_b": 6, "stale_a": 6, "prio_d": 9,
        }
        entrymod._ROTATION_PRIORITY = ["prio_d"]
        got = list(entrymod._rotation_sorted(base))
    finally:
        entrymod._ROTATION_RECORD = saved_record
        entrymod._ROTATION_PRIORITY = saved_prio
    assert got == ["prio_d", "never_c", "stale_b", "stale_a", "fresh_a"]


def test_fingerprint_code_change_makes_query_needy(monkeypatch):
    """The r11 code-changed⇒re-check rule: a query whose current
    fingerprint differs from the vouched one (and with no driver row
    newer than the fingerprint record) must be treated as needy — if
    it sits deep in the registry the audit goes red with NEEDY-BURIED,
    exactly like a never-checked query.

    Pinned on a SYNTHETIC fully-vouched baseline (every stored fp set
    to the current computed fp, vouched at its latest row) rather than
    the repo's live vouch state: a round that edits shared
    infrastructure (r15: ``load()``) legitimately drifts EVERY
    closure, making the whole registry needy at once — burial is then
    vacuously impossible and the live state can't host this assertion
    (the same repo-independence discipline as
    test_rotation_sorted_orders_needy_first)."""
    import tools.rotation_audit as ra

    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries().keys())
    victim = registry[-1]
    latest, newest = load_record()
    fps = ra.compute_fingerprints(entrymod)
    fake = {
        "recorded_at": max(newest, latest.get(victim, 0)),
        "algo": ra.FP_ALGO,
        "queries": {
            q: {"fp": fps[q], "vouched": latest.get(q)} for q in registry
        },
    }
    fake["queries"][victim]["fp"] = "0" * 64
    monkeypatch.setattr(ra, "load_fingerprints", lambda: fake)
    problems = ra.audit()
    assert any(p.startswith(f"NEEDY-BURIED {victim}") for p in problems), problems


def test_fingerprint_refresh_demanded_after_new_row(monkeypatch):
    """A driver row NEWER than the fingerprint record vouches for the
    changed code — the audit demands a regeneration (FP-REFRESH), not
    a reorder."""
    import tools.rotation_audit as ra

    stored = ra.load_fingerprints()
    assert stored is not None
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    latest, newest = load_record()
    victim = next(q for q in entrymod.queries() if latest.get(q) == newest)
    fake = json.loads(json.dumps(stored))
    fake["queries"][victim]["fp"] = "0" * 64
    fake["recorded_at"] = newest - 1
    monkeypatch.setattr(ra, "load_fingerprints", lambda: fake)
    problems = ra.audit()
    assert any(p.startswith(f"FP-REFRESH {victim}") for p in problems), problems


def test_fingerprints_cover_registry_and_flag_unvouched():
    """The committed fingerprint file covers every registry query; the
    unvouched entries are exactly the queries re-checked this round
    (the priority block leads them all)."""
    import sys

    import tools.rotation_audit as ra

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    stored = ra.load_fingerprints()
    assert stored is not None
    registry = list(entrymod.queries().keys())
    assert set(stored["queries"]) == set(registry)
    unvouched = {q for q, e in stored["queries"].items()
                 if e["vouched"] is None}
    # every unvouched query must lead the registry (needy-first)
    positions = {q: i for i, q in enumerate(registry)}
    bound = len(unvouched) + ra.SLACK
    assert all(positions[q] < bound for q in unvouched), sorted(
        (positions[q], q) for q in unvouched)


def test_fingerprint_closure_resolves_function_local_imports():
    """Algo v2: `from X import Y` INSIDE a query function must pull X's
    members into the fingerprint closure — otherwise editing e.g.
    operators/matview.py would not flip pipeline_lifecycle's
    fingerprint and the code-changed rule would silently miss it."""
    import sys

    from tools.rotation_audit import FP_ALGO, _collect_sources

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    assert FP_ALGO >= 2
    seen = {}
    _collect_sources(entrymod.q_pipeline_lifecycle, seen)
    keys = set(seen)
    assert any("operators.matview" in k for k in keys), sorted(keys)[:10]
    assert any("sinks.sync_target" in k for k in keys)
    assert any("operators.upsert" in k for k in keys)


def test_fingerprint_closure_follows_module_aliases():
    """Algo v3: `M.decode_images(...)` with a module-level
    `import ... as M` must pull the operator (and its transitive
    helpers) into the closure — v2 rejected module objects in
    _is_ours (they have no __module__), so every query written in
    that style fingerprinted as just itself + load() and operator
    edits never drifted it."""
    import sys

    from tools.rotation_audit import FP_ALGO, _collect_sources

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    assert FP_ALGO >= 3
    seen = {}
    _collect_sources(entrymod.q_media_decode, seen)
    keys = set(seen)
    assert any("multimodal.decode_images" in k for k in keys), sorted(keys)
    # and transitively into the raw parsers the kernel dispatches to
    assert any("multimodal._parse_image_header" in k for k in keys)
    assert any("multimodal._parse_tiff_dims" in k for k in keys)


def test_fingerprint_closure_records_instance_assignments():
    """Algo v4: a referenced INSTANCE of one of our classes (the
    Converter constants, whose lambdas define cross-engine behavior)
    must contribute its module-level assignment source — otherwise
    editing CONV_TO_I's spark/sql lambda never drifts
    json_extraction."""
    import sys

    from tools.rotation_audit import FP_ALGO, _collect_sources

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    assert FP_ALGO >= 4
    seen = {}
    _collect_sources(entrymod.queries()["json_extraction"], seen)
    key = "inst:webhookdb_spark.functions.converters:CONV_TO_I"
    assert key in seen, sorted(k for k in seen if k.startswith("inst:"))
    # the recorded text is the verbatim assignment, lambdas included
    assert seen[key].startswith("CONV_TO_I = Converter(")
    assert "lambda" in seen[key]
    # and the class closure rode along
    assert any("converters.Converter" in k for k in seen)


def test_rotation_record_matches_audit_view():
    """queries()'s ordering source and the audit must read the SAME
    record (git-tracked correctness files): a divergence would let the
    driver check one order while the audit enforces another."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    audit_latest, _ = load_record()
    entry_latest = entrymod._latest_driver_round()
    assert entry_latest == audit_latest


def test_retro_round_commit_regex_matches_documented_forms(monkeypatch):
    """r14 ADVICE: _round_commits only matched 'round N: verdict...'
    while the docstring claims the verdict/advice/... family — a
    record commit titled with another documented lead word made its
    round silently unauditable."""
    import tools.retro_vouch_audit as rv

    class _R:
        stdout = (
            "aaa round 9: verdict/advice/correctness/bench\n"
            "bbb round 10: advice records\n"
            "ccc round 11: correctness refresh\n"
            "ddd round 12: bench records\n"
            "eee round 13: something unrelated\n"
            "fff not a record commit\n"
        )

    monkeypatch.setattr(rv.subprocess, "run", lambda *a, **k: _R())
    assert set(rv._round_commits()) == {9, 10, 11, 12}


def test_retro_unlocatable_round_with_vouches_fails(
    monkeypatch, capsys, tmp_path
):
    """r14 ADVICE: a round that holds vouches but has no locatable
    round-close commit must FAIL the audit (exit 1), not warn and
    exit 0 — exiting clean there vouches blind.

    Runs against a SYNTHETIC one-vouch fingerprint file: the live file
    can legitimately hold zero vouches right after a round that edits
    shared infrastructure (r15: ``load()`` drifted every closure), and
    with no vouches there is nothing for this rule to fail on."""
    import sys as _sys

    import tools.retro_vouch_audit as rv

    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "query_fingerprints.json").write_text(json.dumps({
        "recorded_at": 14, "algo": 4,
        "queries": {"some_query": {"fp": "0" * 64, "vouched": 12}},
    }))
    monkeypatch.setattr(rv, "REPO", tmp_path)
    monkeypatch.setattr(rv, "_round_commits", lambda: {})
    monkeypatch.setattr(rv, "_fps_at", lambda root: {})
    monkeypatch.setattr(_sys, "argv", ["retro_vouch_audit.py"])
    assert rv.main() == 1
    assert "FAIL" in capsys.readouterr().out
