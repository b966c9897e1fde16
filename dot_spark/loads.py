"""Write protocols: dispositions, micro-batch loads, atomic promote.

Reference semantics:
- S7: bulk load with TRUNCATE / APPEND / EMPTY dispositions,
  create-if-needed (okta_sync_utils.py:226-319,
  woo-sync/bigquery_client.py:28-67).
- S8: streamed batch protocol — first batch truncates, the rest
  append (okta-sync/main.py:908-931, disposition switch :926).
- D1: atomic staging->target promote via CTAS swap
  (okta-sync/main.py:587-625).
- D2: in-place rewrite for dedup — CTAS over self
  (okta-sync/main.py:657-669).

Spark-first: dispositions are save modes; the batch protocol is
mode="overwrite" then mode="append"; the promote is
write-staging-then-rename. Parquet directory rename is atomic on a
POSIX/HDFS namespace under the harness's single-writer assumption —
a production deployment swaps this for an ACID table format commit
(Delta/Iceberg), same call shape.

Scale: loads inherit the DataFrame's partitioning — a 100 TB load is
N parallel file writes, no driver funnel. `partition_cols` lets the
caller lay out the table for downstream partition pruning (e.g.
sync-date partitions for ST2 incremental reads).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """A directory of parquet tables standing in for the reference's
    BigQuery dataset (project.dataset.table -> root/table)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # --- S7 dispositions ---------------------------------------------------

    def write(
        self,
        df: DataFrame,
        table: str,
        disposition: str = "truncate",
        partition_cols: Sequence[str] = (),
    ) -> None:
        """Bulk load with the reference's dispositions: 'truncate'
        (WRITE_TRUNCATE), 'append' (WRITE_APPEND), 'empty'
        (WRITE_EMPTY — fail if the table exists). Creates the table
        if needed in every mode."""
        if disposition == "empty" and self.exists(table):
            raise ValueError(f"table {table} exists (WRITE_EMPTY)")
        mode = "overwrite" if disposition in ("truncate", "empty") else "append"
        writer = df.write.mode(mode)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(self.path(table))

    # --- bucketed layout for co-located joins ------------------------------

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: Sequence[str],
        num_buckets: int = 32,
    ) -> None:
        """Write `table` hash-bucketed (and sorted) on `bucket_cols`.

        Two tables bucketed on the same key with the same bucket
        count join WITHOUT a shuffle: each task reads matching bucket
        files from both sides (sorted, so the sort-merge join needs
        no sort either). This is the pre-partitioning you pay once at
        load time and amortize over every downstream join/groupBy on
        that key — the difference between re-shuffling 100 TB per
        query and never shuffling it again.

        Bucket metadata lives in the session catalog (saveAsTable
        with an explicit path), the files stay under the warehouse
        root. Read back with `read_bucketed` — a plain
        spark.read.parquet would see the files but not the bucketing.
        """
        cols = list(bucket_cols)
        (
            df.write.mode("overwrite")
            .bucketBy(num_buckets, cols[0], *cols[1:])
            .sortBy(cols[0], *cols[1:])
            .option("path", self.path(table))
            .saveAsTable(self._catalog_name(table))
        )

    def read_bucketed(self, table: str) -> DataFrame:
        """Read a table written by write_bucketed, with its bucket
        spec visible to the planner."""
        return self.spark.table(self._catalog_name(table))

    def _catalog_name(self, table: str) -> str:
        # one warehouse == one catalog namespace; the root's basename
        # keeps two Warehouse instances from colliding in the shared
        # session catalog
        ns = "".join(c if c.isalnum() else "_" for c in os.path.basename(self.root))
        return f"wh_{ns}_{table}"

    # --- S8 streamed batch protocol ---------------------------------------

    def load_batches(self, batches: Iterable[DataFrame], table: str) -> int:
        """First batch truncates, the rest append (okta-sync
        main.py:908-931) — the micro-batch load protocol that lets an
        interrupted sync resume without a half-merged table."""
        n = 0
        for i, batch in enumerate(batches):
            self.write(batch, table, "truncate" if i == 0 else "append")
            n += 1
        return n

    # --- D1 atomic promote / D2 in-place rewrite ---------------------------

    def promote(self, staging_table: str, target_table: str) -> None:
        """Atomic staging->target swap (CTAS promote,
        okta-sync/main.py:587-625): the target is replaced in one
        directory rename; readers see the old table until the swap.
        Single-writer assumption, as in the reference."""
        staging, target = self.path(staging_table), self.path(target_table)
        if not os.path.isdir(staging):
            raise FileNotFoundError(staging)
        trash = f"{target}.old-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(target):
            os.rename(target, trash)
        try:
            os.rename(staging, target)
        except BaseException:
            if os.path.isdir(trash):
                os.rename(trash, target)
            raise
        if os.path.isdir(trash):
            shutil.rmtree(trash)

    def rewrite(self, table: str, transform: Callable[[DataFrame], DataFrame]) -> None:
        """In-place rewrite (D2: CTAS over self for the warehouse-side
        dedup, okta-sync/main.py:657-669). Spark cannot overwrite a
        table it is reading, so the rewrite stages through a temp
        table and promotes — the reference's temp-dataset pattern."""
        staging = f"{table}.rewrite-{uuid.uuid4().hex[:8]}"
        out = transform(self.read(table))
        self.write(out, staging, "truncate")
        self.promote(staging, table)

    # --- ST3 effectively-once micro-batch sink -----------------------------

    def idempotent_batch_sink(self, table: str) -> Callable[[DataFrame, int], None]:
        """foreachBatch sink that makes at-least-once delivery
        effectively-once (ST3: duplicate triggers tolerated,
        docs/DESIGN_fivetran_slot_safety_valve.md:90-97,
        docs/ARCHITECTURE.md:94,107).

        Each micro-batch writes to its own `batch=<id>` subdirectory
        with mode=overwrite: a redelivered batch (engine recovery,
        duplicate trigger) overwrites ITS OWN directory instead of
        appending a second copy, so replays are harmless — including
        replays of a partially-written batch, which is the case a
        committed-ids marker file cannot fix. Readers scan the table
        root and see each batch exactly once; partition discovery
        surfaces the batch id as a `batch` column — free provenance
        (drop it if unwanted).
        """

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.path(table), f"batch={batch_id}")
            )

        return sink
