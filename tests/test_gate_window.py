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


def _gate_history() -> tuple[dict[str, int], int]:
    """(query -> newest green round, newest receipt round) from the
    committed CORRECTNESS_r*.json receipts."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        newest = max(newest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    if not latest:
        pytest.skip("no CORRECTNESS receipts committed yet")
    return latest, newest


def test_registry_leads_with_the_active_window():
    head = list(Q.QUERIES)[: len(Q._WINDOW_PRIORITY)]
    assert head == Q._WINDOW_PRIORITY


def test_active_window_covers_the_stalest_cohort_first():
    """Every query staler than the active window's own staleness
    floor must be IN the window: the rotation may not skip over the
    oldest rows (modulo explicitly staged changed-semantics swaps,
    which by construction enter the window rather than leave it)."""
    latest, newest = _gate_history()
    in_window = set(Q._WINDOW_PRIORITY)
    floor = min(latest[n] for n in in_window if n in latest)
    skipped = [
        n for n, rnd in latest.items() if rnd < floor and n not in in_window
    ]
    assert not skipped, f"stalest cohort not fully covered: {skipped}"


def test_no_query_exceeds_staleness_bound_after_staged_window():
    """Simulate the active window landing this round and the staged
    window landing next round; assert no query's latest row would
    then be more than MAX_STALE_ROUNDS behind."""
    latest, newest = _gate_history()
    this_round = newest + 1
    projected = dict(latest)
    for n in Q._WINDOW_PRIORITY:
        projected[n] = this_round
    for n in Q._R13_WINDOW:
        projected[n] = this_round + 1
    horizon = this_round + 1
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
    latest, _ = _gate_history()
    pending = set(Q._WINDOW_PRIORITY) | set(Q._R13_WINDOW)
    orphans = [n for n in Q.QUERIES if n not in latest and n not in pending]
    assert not orphans, f"never-gated queries outside any window: {orphans}"
