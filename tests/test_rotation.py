"""Rotation-window invariants as pytest pins.

tools/rotation_check.py is the round-maintenance tool; these tests
keep its invariants enforced on every `pytest tests/` run so a
registry or rotation edit that silently breaks the CORRECTNESS window
(the driver checks the FIRST 50 registry entries) fails loudly before
the driver ever sees it. No Spark session needed — pure metadata.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.plans import rotation as rot  # noqa: E402

WINDOW = 50


def test_every_registry_name_in_exactly_one_rotation_list():
    """An unlisted query silently jumps the queue and evicts a window
    slot; a stale listed name makes the derived ordering lie."""
    listed = (
        rot.VERIFIED_GREEN + rot.ORACLE_FIXED + rot.UNCHECKED_PRIORITY
        + ["flagship_star_fact"]
    )
    missing = [n for n in REGISTRY if n not in set(listed)]
    assert not missing, f"registry names in NO rotation list: {missing}"
    stale = [n for n in set(listed) if n not in REGISTRY]
    assert not stale, f"rotation lists name nonexistent queries: {stale}"


def test_unchecked_priority_fits_in_window():
    """A never-driver-checked query outside the 50-slot window would
    end the round without a CORRECTNESS row."""
    window = set(list(REGISTRY)[:WINDOW])
    out = [n for n in rot.UNCHECKED_PRIORITY if n not in window]
    assert not out, f"UNCHECKED_PRIORITY outside the driver window: {out}"


def test_flagship_is_first():
    assert next(iter(REGISTRY)) == "flagship_star_fact"


def test_oracle_texts_match_committed_snapshot():
    """Oracle-text drift pin (the historically riskiest change class —
    the round-4 kmeans seeding CTE): every oracle edit must be
    re-snapshotted via `python tools/rotation_check.py --update-hashes`
    AFTER positioning the changed query inside the driver window, so a
    changed oracle can never ship driver-unverified."""
    manifest = json.load(open(REPO / "tools" / "oracle_hashes.json"))
    current = {
        name: hashlib.sha256(spec.oracle.encode()).hexdigest()
        for name, spec in REGISTRY.items()
        if spec.oracle
    }
    window = set(list(REGISTRY)[:WINDOW])
    drifted = [
        n
        for n, h in current.items()
        if manifest.get(n) != h and n not in window
    ]
    assert not drifted, (
        "oracle text changed OUTSIDE the driver window (move the query "
        "into the window, then run tools/rotation_check.py "
        f"--update-hashes): {drifted}"
    )


def test_no_intra_list_duplicates():
    """Round-7 ADVICE: a name repeated WITHIN a rotation list is deduped
    by first occurrence at reorder() time, silently ordering a
    freshly-regreen query by its stale earlier position."""
    for label, block in (
        ("VERIFIED_GREEN", rot.VERIFIED_GREEN),
        ("ORACLE_FIXED", rot.ORACLE_FIXED),
        ("UNCHECKED_PRIORITY", rot.UNCHECKED_PRIORITY),
    ):
        dupes = sorted({n for n in block if block.count(n) > 1})
        assert not dupes, f"duplicate names within {label}: {dupes}"


def test_freshness_green_requires_explicit_hash_match():
    """Round-7 verdict item 5: a driver row missing hash_match is a
    degraded row, not a green one — the staleness queue must never be
    satisfied by a weaker check than the round goal demands."""
    spec = importlib.util.spec_from_file_location(
        "freshness", REPO / "tools" / "freshness.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    full = {"rows_match": True, "schema_match": True, "hash_match": True}
    assert mod.green(full)
    assert not mod.green({"rows_match": True, "schema_match": True})
    assert not mod.green({**full, "hash_match": None})
    assert not mod.green({**full, "hash_match": False})
    assert not mod.green({**full, "rows_match": None})


def test_rotation_check_tool_passes():
    """The maintenance tool itself must agree (it is what the round
    workflow actually runs)."""
    import sys
    from unittest import mock

    spec = importlib.util.spec_from_file_location(
        "rotation_check", REPO / "tools" / "rotation_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with mock.patch.object(sys, "argv", ["rotation_check.py"]):
        assert mod.main() == 0
