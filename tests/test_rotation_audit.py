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
