"""Driver-side orchestration utilities (ST6: poll-until-state-change).

Reference: the sync jobs poll a remote status at a fixed interval
until it reaches a terminal value (okta-sync/okta_sync_utils.py:
580-607 — 30 s dbt-run status loop), or until an observed value
CHANGES from its pre-trigger snapshot (fivetran-trigger/
fivetran_client.py:101-118 — success/failure timestamps), with the
documented backoff envelope of 30 s doubling to a 300 s cap and at
most 60 polls (docs/ARCHITECTURE.md:128).

SURVEY §2.8 scopes ST6 to the orchestration layer — it is driver
control flow around engine jobs (e.g. "wait for the upstream loader
to finish before reading its table"), NOT a distributed operator, so
it deliberately lives outside the DataFrame surface and has no
queries() entry. `sleep` is injectable so tests pin the exact
schedule without wall-clock waits.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any, TypeVar

T = TypeVar("T")


class PollTimeout(TimeoutError):
    """Raised when `max_polls` fetches complete without the predicate
    holding. Carries the last observed value for fail-closed handling
    (the reference logs-and-returns; an engine caller usually wants
    to know what state it gave up in)."""

    def __init__(self, last: Any, polls: int):
        super().__init__(f"predicate still false after {polls} polls (last={last!r})")
        self.last = last
        self.polls = polls


@dataclass(frozen=True)
class PollResult:
    """Outcome of a successful poll loop."""

    value: Any
    polls: int  # fetches performed (>= 1)
    waited: float  # total seconds handed to `sleep`


def poll_until(
    fetch: Callable[[], T],
    done: Callable[[T], bool],
    *,
    interval: float = 30.0,
    backoff: float = 1.0,
    max_interval: float = 300.0,
    max_polls: int = 60,
    sleep: Callable[[float], None] = time.sleep,
) -> PollResult:
    """Fetch-and-test until `done(value)` — the ST6 loop.

    The first fetch happens immediately (no initial sleep); each
    subsequent fetch waits `interval * backoff**k`, capped at
    `max_interval`. `backoff=1.0` is the reference's fixed 30 s poke
    (okta_sync_utils.py:581); `backoff=2.0, max_interval=300` is the
    documented Hightouch envelope (docs/ARCHITECTURE.md:128). After
    `max_polls` fetches without success, raises PollTimeout with the
    last value.
    """
    if max_polls < 1:
        raise ValueError("max_polls must be >= 1")
    waited = 0.0
    delay = float(interval)
    value: T = fetch()
    for polls in range(1, max_polls + 1):
        if done(value):
            return PollResult(value=value, polls=polls, waited=waited)
        if polls == max_polls:
            break
        sleep(min(delay, max_interval))
        waited += min(delay, max_interval)
        delay = min(delay * backoff, max_interval)
        value = fetch()
    raise PollTimeout(value, max_polls)


def poll_until_change(
    fetch: Callable[[], T],
    initial: T | None = None,
    **kw,
) -> PollResult:
    """Poll until the fetched value DIFFERS from a pre-trigger
    snapshot — the fivetran_client.py:101-118 shape ("the
    success/failure timestamps moved, so the sync we kicked off has
    finished"). If `initial` is not given it is snapshotted with one
    extra fetch before the poll loop starts."""
    if initial is None:
        return poll_until(fetch, _Changed(fetch()), **kw)
    return poll_until(fetch, _Changed(initial), **kw)


class _Changed:
    def __init__(self, baseline: Any):
        self.baseline = baseline

    def __call__(self, value: Any) -> bool:
        return value != self.baseline
