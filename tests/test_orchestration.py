"""ST6 poll-until-state-change (dot_spark/orchestration.py).

Rule-per-test in the reference's style (dbt-classify/main_test.py):
each scheduling/termination rule gets its own test, with an injected
sleep so the exact backoff schedule is asserted without wall-clock
waits.
"""

from __future__ import annotations

import pytest

from dot_spark.orchestration import PollResult, PollTimeout, poll_until, poll_until_change


def _script(values):
    it = iter(values)

    def fetch():
        return next(it)

    return fetch


def test_done_on_first_fetch_never_sleeps():
    sleeps = []
    res = poll_until(_script([10]), lambda v: v == 10, sleep=sleeps.append)
    assert res == PollResult(value=10, polls=1, waited=0.0)
    assert sleeps == []


def test_fixed_interval_poke_like_dbt_status_loop():
    # okta_sync_utils.py:580-607: fixed 30 s sleeps until terminal
    sleeps = []
    res = poll_until(
        _script([1, 2, 3, 10]), lambda v: v in (10, 20, 30), sleep=sleeps.append
    )
    assert res.value == 10 and res.polls == 4
    assert sleeps == [30.0, 30.0, 30.0]
    assert res.waited == 90.0


def test_exponential_backoff_caps_at_max_interval():
    # docs/ARCHITECTURE.md:128: 30 s doubling to a 300 s cap
    sleeps = []
    res = poll_until(
        _script(range(8)),
        lambda v: v == 7,
        backoff=2.0,
        sleep=sleeps.append,
    )
    assert res.polls == 8
    assert sleeps == [30.0, 60.0, 120.0, 240.0, 300.0, 300.0, 300.0]


def test_max_polls_raises_with_last_value():
    sleeps = []
    with pytest.raises(PollTimeout) as ei:
        poll_until(_script([3] * 60), lambda v: v == 10, sleep=sleeps.append)
    assert ei.value.polls == 60
    assert ei.value.last == 3
    # 60 fetches = 59 sleeps between them, none after the last
    assert len(sleeps) == 59


def test_change_detection_with_explicit_snapshot():
    # fivetran_client.py:101-118: wait until the success timestamp moves
    sleeps = []
    res = poll_until_change(
        _script(["t0", "t0", "t1"]), initial="t0", sleep=sleeps.append
    )
    assert res.value == "t1" and res.polls == 3


def test_change_detection_snapshots_first_fetch():
    res = poll_until_change(_script(["a", "a", "b"]), sleep=lambda _s: None)
    assert res.value == "b"


def test_max_polls_must_be_positive():
    with pytest.raises(ValueError):
        poll_until(_script([1]), lambda v: True, max_polls=0)
