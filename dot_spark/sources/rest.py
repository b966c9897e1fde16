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
from collections.abc import Iterator, Sequence

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


class PagedJsonDataSource(DataSource):
    """`spark.read.format("paged_json")` options:

    - path: base directory of the page tree
    - keys: comma-separated parent keys (one partition per key);
      default a single "" key (flat chain at the base path)
    - first_page: name of the chain head (default "page-0")
    - parent_col: column to stamp with the partition's parent key
      (default none)
    - filterable: comma-separated columns the "server" can filter
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

    @staticmethod
    def _fetch_page(path: str) -> dict:
        # transport seam: a live deployment swaps this for an HTTP GET
        # with retry/backoff (okta_sync_utils.py:72-193 semantics)
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)


def register_paged_json(spark) -> None:
    """Register the format with a SparkSession (idempotent)."""
    from dot_spark.sources.registry import ensure_session_confs

    ensure_session_confs(spark)  # pushFilters needs the runtime conf
    spark.dataSource.register(PagedJsonDataSource)
