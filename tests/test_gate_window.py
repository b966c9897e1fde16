"""Gate-window hygiene: the staleness policy as code, not prose.

The driver gates the FIRST 50 entries of the ``QUERIES`` registry
each round (``__spark_entry__.queries()`` preserves insertion order,
and the registry is re-ordered so ``_WINDOW_PRIORITY`` leads).  The
policy the round notes have carried since round 8 — rotate windows so
no query's latest official CORRECTNESS row falls more than 4 rounds
stale — lived only in prose until now.  These tests replay the
committed CORRECTNESS receipts against the ACTIVE window and the
STAGED next-round window and fail the build if executing them as
planned would leave any query past the staleness bound, so a future
mid-round swap that silently starves a cohort cannot land.

Round-boundary semantics (the r12 off-by-one, fixed in r13): every
round STARTS with the driver's freshly-written receipt for the window
that just executed already on disk, and the next window's swap commit
not yet made.  So "which window executes next" cannot be inferred
from receipt count alone: if the newest receipt's key set equals the
ACTIVE ``_WINDOW_PRIORITY``, that window has ALREADY landed and the
STAGED window is what executes next (at ``newest + 1``); otherwise
the active window is still pending (it lands at ``newest + 1`` and
the staged window at ``newest + 2``).  ``_next_windows()`` below
encodes exactly that, so the suite is green on the precise state a
round starts from while a genuinely skipped cohort still fails.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from dot_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAX_STALE_ROUNDS = 4


def _gate_history() -> tuple[dict[str, int], int, frozenset[str]]:
    """(query -> newest green round, newest receipt round, newest
    receipt's key set) from the committed CORRECTNESS_r*.json
    receipts."""
    latest: dict[str, int] = {}
    newest = 0
    newest_keys: frozenset[str] = frozenset()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        if rnd > newest:
            newest = rnd
            newest_keys = frozenset(rows)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    if not latest:
        pytest.skip("no CORRECTNESS receipts committed yet")
    return latest, newest, newest_keys


def _next_windows() -> tuple[dict[str, int], list[tuple[list[str], int]]]:
    """(latest, [(window, round it executes at), ...]) for the windows
    that have NOT yet landed, per the round-boundary semantics in the
    module docstring."""
    latest, newest, newest_keys = _gate_history()
    if newest_keys == frozenset(Q._WINDOW_PRIORITY):
        # The active window already executed (its receipt is the
        # newest on disk — the round-start state before the swap
        # commit); only the staged window is pending.
        pending = [(Q._STAGED_WINDOW, newest + 1)]
    else:
        pending = [
            (Q._WINDOW_PRIORITY, newest + 1),
            (Q._STAGED_WINDOW, newest + 2),
        ]
    return latest, pending


def test_registry_leads_with_the_active_window():
    head = list(Q.QUERIES)[: len(Q._WINDOW_PRIORITY)]
    assert head == Q._WINDOW_PRIORITY


def test_active_window_covers_the_stalest_cohort_first():
    """Every query staler than the next-to-execute window's own
    staleness floor must be IN that window: the rotation may not skip
    over the oldest rows (modulo explicitly staged changed-semantics
    swaps, which by construction enter the window rather than leave
    it)."""
    latest, pending = _next_windows()
    in_window = set(pending[0][0])
    floor = min(latest[n] for n in in_window if n in latest)
    skipped = [
        n for n, rnd in latest.items() if rnd < floor and n not in in_window
    ]
    assert not skipped, f"stalest cohort not fully covered: {skipped}"


def test_no_query_exceeds_staleness_bound_after_staged_window():
    """Simulate every pending window landing at its scheduled round;
    assert no query's latest row would then be more than
    MAX_STALE_ROUNDS behind the last of those rounds."""
    latest, pending = _next_windows()
    projected = dict(latest)
    for window, rnd in pending:
        for n in window:
            projected[n] = rnd
    horizon = pending[-1][1]
    stale = {
        n: rnd
        for n, rnd in projected.items()
        if horizon - rnd > MAX_STALE_ROUNDS
    }
    assert not stale, (
        f"queries left >{MAX_STALE_ROUNDS} rounds stale after the staged "
        f"window executes (round {horizon}): {stale}"
    )


def test_every_registered_query_has_a_gate_row_or_is_new():
    """A registered query with NO official row ever is only
    acceptable if it is in the active or staged window (i.e. it is
    new and about to be gated) — zero never-gated stragglers."""
    latest, _, _ = _gate_history()
    pending = set(Q._WINDOW_PRIORITY) | set(Q._STAGED_WINDOW)
    orphans = [n for n in Q.QUERIES if n not in latest and n not in pending]
    assert not orphans, f"never-gated queries outside any window: {orphans}"


def test_staged_window_disjoint_from_active():
    """The swap must be a rotation, not a repeat (changed-semantics
    re-gates are swapped INTO the active window, never left in the
    staged one)."""
    assert not set(Q._STAGED_WINDOW) & set(Q._WINDOW_PRIORITY)
    assert len(Q._STAGED_WINDOW) == 50
