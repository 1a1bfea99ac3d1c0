"""Rotation invariant as CI: every registered query has a driver slot.

The driver's CORRECTNESS snapshot records only the first 50 registry
entries (BASELINE.md "Driver correctness snapshot cap"), so coverage of
the full inventory is achieved by rotating ``_R*_WINDOW`` across rounds.
This test turns the rotation bookkeeping — previously prose in
BASELINE.md — into an executable invariant: a query registered without
either a historical CORRECTNESS row or a slot in the current window
fails CI immediately instead of silently never being driver-checked.
"""

import glob
import json
import os

import sunat_rree_demo_spark.queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _historical_keys():
    seen = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            seen.update(json.load(fh).keys())
    return seen


def test_every_query_has_a_driver_slot():
    seen = _historical_keys()
    window = set(Q._R12_WINDOW)
    uncovered = [
        name for name in Q.REGISTRY if name not in seen and name not in window
    ]
    assert not uncovered, (
        "queries registered without a scheduled driver slot "
        f"(add to _R12_NEW in queries/__init__.py): {uncovered}"
    )


def test_window_is_full_and_valid():
    # the driver snapshots exactly 50 entries; an undersized window wastes
    # correctness slots, an oversized one silently truncates
    assert len(Q._R12_WINDOW) == 50
    assert len(set(Q._R12_WINDOW)) == 50
    missing = [n for n in Q._R12_WINDOW if n not in Q.REGISTRY]
    assert not missing, f"window names not in REGISTRY (typo?): {missing}"
    # the window must actually be the head of the registry iteration order
    assert list(Q.REGISTRY)[:50] == list(Q._R12_WINDOW)


def test_planned_names_have_no_typos():
    # _R12_FILLERS references queries that must already exist; _R12_NEW may
    # name not-yet-registered queries (they are this round's build plan)
    # but anything registered must spell its window name right.
    for name in Q._R12_FILLERS:
        assert name in Q.REGISTRY, name
