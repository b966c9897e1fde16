"""Paginated REST-style source as a real PySpark (4.x) Python Data
Source — the engine-level home for the reference's API scans:

- S1 link-chain pagination (okta-sync/main.py:233-305 follows
  RFC-5988 `next` links page by page): `read()` walks a page chain,
  yielding each page's records; the chain pointer is whatever the
  previous page's `next` field says, exactly the link-header shape.
- S3 per-key fan-out (okta-sync/main.py:426-510 pages through
  /groups/{id}/users per id and tags rows with the parent id):
  `partitions()` emits ONE InputPartition PER PARENT KEY, so a
  1000-executor cluster walks 1000 page chains concurrently and each
  row carries its `parent_id` — the fan-out is the partitioning.
- P3 server-side predicate pushdown (okta-sync/main.py:883 `search:
  status eq "DEPROVISIONED"`; woo-sync/main.py:1156
  `modified_after`): `pushFilters()` accepts EqualTo/GreaterThan(-
  OrEqual) on columns declared server-filterable and applies them
  while reading, returning every other filter to Spark. The plan
  then shows the residual filters only — same contract as DSv2.

The transport is pluggable-by-path: pages are JSON documents at
`{base}/{key}/page-N.json` of the form
`{"records": [...], "next": "page-M" | null}`. The harness points it
at local fixture files (the container has no network); against a live
API only `_fetch_page` changes — the pagination, fan-out, pushdown,
and schema contracts are transport-independent.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
)
from pyspark.sql.types import StructType


# --- live-transport hardening ------------------------------------------
#
# The reference's HTTP fetch (okta-sync/okta_sync_utils.py:72-193)
# survives four failure classes, each with its own cadence: 429 rate
# limits back off exponentially (1 s doubling, retried until the
# server relents — rate limiting is the server pacing the client, not
# a fault, so it does NOT consume the bounded retry budget); invalid
# JSON bodies, non-429 HTTP errors, timeouts and connection errors
# each burn one of max_retries+1 bounded attempts with a
# class-specific delay. Re-expressed here as a pure wrapper over an
# injectable transport so the policy is unit-testable without a
# network (the sandbox has none) and swappable for requests/urllib in
# a live deployment. The sleeper is injected for the same reason.


class RateLimited(Exception):
    """Transport signal: the server said 'slow down' (HTTP 429)."""


class TransientFetchError(Exception):
    """Transport signal: a retryable fault (5xx, timeout, connection
    reset). ``delay`` is the class-specific pause the reference uses
    (180 s for HTTP errors, 60 s for timeouts/connection faults,
    300 s general)."""

    def __init__(self, msg: str = "", delay: float = 60.0):
        super().__init__(msg)
        self.delay = delay


class FetchFailed(Exception):
    """Raised when the bounded retry budget is exhausted — the
    engine-appropriate form of the reference returning None (a Spark
    task must fail loudly so the scheduler retries/aborts the stage,
    not silently yield an empty page)."""


def fetch_with_retry(
    transport: Callable[[str], str | dict],
    url: str,
    max_retries: int = 5,
    backoff_initial: float = 1.0,
    invalid_json_delay: float = 300.0,
    sleep: Callable[[float], None] | None = None,
) -> dict:
    """Fetch one page document through ``transport`` with the
    reference's retry contract. ``transport`` returns the raw body
    (str, parsed here so invalid JSON is retryable) or an
    already-parsed dict; it raises RateLimited / TransientFetchError
    to signal the two retryable fault classes. Any other exception
    propagates — non-retryable faults (4xx other than 429) should
    fail the task immediately.

    ``sleep`` defaults to ``time.sleep`` resolved at CALL time (not
    bound at def time) so tests that monkeypatch this module's
    ``time`` actually intercept the waits."""
    if sleep is None:
        sleep = time.sleep
    retries = 0
    delay = backoff_initial
    while retries <= max_retries:
        try:
            raw = transport(url)
        except RateLimited:
            # server pacing, not a fault: exponential doubling, no
            # budget consumed (reference: inner `while True` loop)
            sleep(delay)
            delay *= 2
            continue
        except TransientFetchError as e:
            retries += 1
            if retries > max_retries:
                break
            sleep(e.delay)
            continue
        if isinstance(raw, dict):
            return raw
        try:
            return json.loads(raw)
        except ValueError:
            # a 200 with a garbage body: bounded retry, long pause
            retries += 1
            if retries > max_retries:
                break
            sleep(invalid_json_delay)
    raise FetchFailed(f"fetch failed after {max_retries + 1} attempts: {url}")


# Fail-fast knobs for transports where retrying cannot help: a local
# file does not heal, so a corrupt page must fail the task NOW, not
# after max_retries x invalid_json_delay of real sleeping (~25 min).
# Live HTTP transports carry no retry_policy attribute and get the
# reference cadence (okta_sync_utils.py:127-191 semantics).
_FAIL_FAST_POLICY = {
    "max_retries": 0,
    "backoff_initial": 0.0,
    "invalid_json_delay": 0.0,
}


def _file_transport(path: str) -> str:
    """Default transport: the fixture tree (the sandbox has no
    network). Returns the raw body so the JSON-validity retry path is
    exercised identically to a live HTTP transport — but under the
    fail-fast policy, because re-reading the same local file can
    never produce a different body."""
    with open(path, encoding="utf-8") as fh:
        return fh.read()


_file_transport.retry_policy = _FAIL_FAST_POLICY


def http_transport(url: str, timeout: float = 30.0) -> str:
    """Live HTTP GET (stdlib urllib), mapping response classes onto
    the retry signals the policy understands — the same fault
    taxonomy as the reference client (okta_sync_utils.py:127-191):

    - 429              -> RateLimited (exponential pacing, no budget)
    - 5xx              -> TransientFetchError(delay=180)  # http class
    - timeout/conn err -> TransientFetchError(delay=60)   # net class
    - other 4xx        -> HTTPError propagates (non-retryable)

    Carries NO retry_policy attribute, so it runs under the full
    reference cadence."""
    import socket
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        if e.code == 429:
            raise RateLimited(f"429: {url}") from e
        if 500 <= e.code < 600:
            raise TransientFetchError(f"http {e.code}: {url}", delay=180.0) from e
        raise
    except (TimeoutError, socket.timeout) as e:
        raise TransientFetchError(f"timeout: {url}", delay=60.0) from e
    except (urllib.error.URLError, ConnectionError) as e:
        raise TransientFetchError(f"{e}: {url}", delay=60.0) from e


# named transports selectable via the reader's `transport` option —
# the production seam (no monkeypatching needed to go live): a reader
# built on executors re-resolves the name to the module-level
# function, so the choice survives pickling.
_TRANSPORTS: dict[str, Callable[[str], str | dict]] = {
    "file": _file_transport,
    "http": http_transport,
}


class PagedJsonDataSource(DataSource):
    """`spark.read.format("paged_json")` options:

    - path: base directory of the page tree
    - keys: comma-separated parent keys (one partition per key);
      default a single "" key (flat chain at the base path)
    - first_page: name of the chain head (default "page-0")
    - parent_col: column to stamp with the partition's parent key
      (default none)
    - filterable: comma-separated columns the "server" can filter
    - transport: "file" (default) or "http" — live HTTP GET with the
      reference retry cadence; `path` is then a base URL
    - max_retries / backoff_initial / invalid_json_delay: retry-knob
      overrides (defaults: the transport's policy)
    """

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError("paged_json requires a 'schema' DDL option")
        return ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        return PagedJsonReader(schema, dict(self.options))


class _KeyPartition(InputPartition):
    def __init__(self, key: str):
        self.key = key


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.filterable = {
            c.strip() for c in options.get("filterable", "").split(",") if c.strip()
        }
        self.pushed: list[Filter] = []
        # only shadow the class-attribute seam when explicitly asked:
        # tests and subclasses that patch the class attribute keep
        # working, and an instance attribute pointing at a module-
        # level function still pickles by reference to executors.
        if "transport" in options:
            name = options["transport"]
            if name not in _TRANSPORTS:
                raise ValueError(
                    f"unknown transport {name!r}; expected one of {sorted(_TRANSPORTS)}"
                )
            self.transport = _TRANSPORTS[name]

    # --- P3: server-side pushdown -------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual))
                and len(f.attribute) == 1
                and f.attribute[0] in self.filterable
            ):
                self.pushed.append(f)
            else:
                yield f  # residual: Spark evaluates it post-scan

    # --- S3: one page chain per parent key ----------------------------
    def partitions(self) -> Sequence[InputPartition]:
        keys = [k for k in self.options.get("keys", "").split(",") if k] or [""]
        return [_KeyPartition(k) for k in keys]

    # --- S1: walk the link chain --------------------------------------
    def read(self, partition: _KeyPartition) -> Iterator[tuple]:
        base = self.options["path"]
        root = os.path.join(base, partition.key) if partition.key else base
        parent_col = self.options.get("parent_col")
        names = list(self.schema.fieldNames())
        page = self.options.get("first_page", "page-0")
        while page:
            doc = self._fetch_page(os.path.join(root, f"{page}.json"))
            for rec in doc.get("records", []):
                if parent_col:
                    rec = {**rec, parent_col: partition.key}
                if self._keep(rec):
                    yield tuple(rec.get(n) for n in names)
            page = doc.get("next")

    def _keep(self, rec: dict) -> bool:
        for f in self.pushed:
            v = rec.get(f.attribute[0])
            if v is None:
                return False
            if isinstance(f, EqualTo) and not v == f.value:
                return False
            if isinstance(f, GreaterThan) and not v > f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
                return False
        return True

    # transport seam: a live deployment swaps _file_transport for an
    # HTTP GET raising RateLimited/TransientFetchError; the retry/
    # backoff policy (okta_sync_utils.py:72-193 semantics) lives in
    # fetch_with_retry. The policy is PER-TRANSPORT: a transport may
    # carry a `retry_policy` dict of knob overrides (_file_transport
    # is fail-fast — retrying a local read is pointless), and reader
    # options (`max_retries`, `backoff_initial`, `invalid_json_delay`)
    # override both. Class attribute so tests (and subclasses) inject
    # a failing transport; must stay a picklable module-level
    # callable — the reader ships to executors.
    transport = staticmethod(_file_transport)

    def _fetch_page(self, path: str) -> dict:
        policy = dict(getattr(self.transport, "retry_policy", {}))
        if "max_retries" in self.options:
            policy["max_retries"] = int(self.options["max_retries"])
        for knob in ("backoff_initial", "invalid_json_delay"):
            if knob in self.options:
                policy[knob] = float(self.options[knob])
        return fetch_with_retry(self.transport, path, **policy)


def register_paged_json(spark) -> None:
    """Register the format with a SparkSession (idempotent)."""
    from dot_spark.sources.registry import ensure_session_confs

    ensure_session_confs(spark)  # pushFilters needs the runtime conf
    spark.dataSource.register(PagedJsonDataSource)
