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

import json
import os
import shutil
import urllib.parse
import uuid
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _all_null_safe_eq(
    left: DataFrame, right: DataFrame, cols: Sequence[str]
) -> Column:
    """AND of ``left[c] <=> right[c]`` — the join condition for key
    and partition tuples where NULL is a legitimate VALUE (hive's
    default partition, nullable CDC keys). A name-list equi-join
    drops NULL==NULL matches and silently mis-scopes them."""
    cond = left[cols[0]].eqNullSafe(right[cols[0]])
    for c in cols[1:]:
        cond = cond & left[c].eqNullSafe(right[c])
    return cond


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """Morton (Z-curve) key over numeric columns as ONE codegen
    expression: each column min/max-scales to a ``bits``-wide
    integer, and the integers' bits interleave (bit b of column i
    lands at position b*k+i). Ordering by the key clusters rows that
    are close in every dimension simultaneously.

    The min/max stats come from one tiny aggregate (two driver
    scalars per column — the documented watermark-style exception,
    never row data). A constant or all-NULL column scales to 0 and
    drops out of the ordering. ``bits`` is auto-reduced so the key
    fits a signed long: position 63 would flip the sign (sorting
    extreme-high rows before the minimum) and positions >= 64 wrap
    under the JVM's 6-bit shift masking, colliding columns' bits —
    either silently anti-clusters the layout."""
    k = len(cols)
    if not k:
        raise ValueError("zorder_key needs at least one column")
    bits = min(bits, 63 // k)
    row = df.agg(
        *[F.min(c).alias(f"mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx{i}") for i, c in enumerate(cols)],
    ).first()
    key = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        mn_raw, mx_raw = row[f"mn{i}"], row[f"mx{i}"]
        if mn_raw is None or mx_raw is None:  # empty table / all-NULL col
            continue
        mn, mx = float(mn_raw), float(mx_raw)
        span = mx - mn
        if span <= 0:
            continue
        scaled = F.coalesce(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top
                ).cast("long"),
            ),
            F.lit(0),  # NULL sorts with the minimum, key stays non-null
        )
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    return key


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

    def read(self, table: str, merge_schema: bool = False) -> DataFrame:
        """Read a table. ``merge_schema=True`` reconciles part files
        written under EVOLVED schemas (a later append added columns):
        the union schema is read, earlier files' missing columns come
        back NULL — the additive-evolution contract a long-lived
        ingest table needs. Off by default: schema merging lists and
        footer-reads every file at planning time, a real cost on a
        100 TB table, so it is an explicit opt-in for tables known to
        have evolved.

        An EMPTIED table (every row CDC-deleted, zero data files —
        parquet schema inference has nothing to read) comes back as
        an empty DataFrame with the schema recorded at write time:
        the reason the metadata marker stores schema_ddl at all."""
        if self.exists(table) and not self.has_data_files(table):
            meta = self._table_meta(table)
            if meta and meta.get("schema_ddl"):
                return self.spark.createDataFrame([], meta["schema_ddl"])
        r = self.spark.read
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(self.path(table))

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
        # APPEND must honor the table's existing partition spec: a
        # caller omitting partition_cols (harmless pre-metadata, when
        # layout was inferred from key=value dirs) would otherwise
        # both write FLAT files into a hive-layout root and clobber
        # the recorded spec with [] — the amnesia the marker exists
        # to prevent. Truncate/empty replace the table, so the
        # caller's spec wins there.
        effective = list(partition_cols)
        appending = disposition == "append" and self.exists(table)
        if appending:
            recorded = self.partition_cols_of(table)
            if not effective:
                effective = recorded
            elif effective != recorded:
                # BOTH directions are the same corruption class: hive
                # key=value dirs appended into a flat-file root (recorded
                # []) is just as mixed-layout as the reverse, and letting
                # it through would also clobber the recorded spec below.
                raise ValueError(
                    f"append partition_cols {effective} != table spec {recorded}"
                )
        writer = df.write.mode(mode)
        if effective:
            writer = writer.partitionBy(*effective)
        writer.parquet(self.path(table))
        self._record_partition_cols(
            table, effective, df, merge_schema_with_recorded=appending
        )

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

    def drop(self, table: str) -> None:
        """Remove a table (directory delete; no-op if absent)."""
        shutil.rmtree(self.path(table), ignore_errors=True)

    def adopt_files(self, staging_table: str, target_table: str) -> None:
        """Append by FILE ADOPTION: move the staging table's data
        files into the target directory. Parquet append is exactly
        "more files in the directory", so adopting renames the
        already-written delta instead of re-reading and re-writing it
        — the second half of the single-scan ingest protocol
        (pipelines._ingest_once). Metadata files (_SUCCESS, .crc)
        stay behind; a uuid prefix keeps part names collision-free."""
        src, dst = self.path(staging_table), self.path(target_table)
        if not os.path.isdir(src):
            raise FileNotFoundError(src)
        os.makedirs(dst, exist_ok=True)
        tag = uuid.uuid4().hex[:8]
        for name in sorted(os.listdir(src)):
            if name.startswith(("_", ".")):
                continue
            os.rename(os.path.join(src, name), os.path.join(dst, f"{tag}-{name}"))

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

    def rewrite(
        self,
        table: str,
        transform: Callable[[DataFrame], DataFrame],
        partition_cols: Sequence[str] = (),
    ) -> None:
        """In-place rewrite (D2: CTAS over self for the warehouse-side
        dedup, okta-sync/main.py:657-669). Spark cannot overwrite a
        table it is reading, so the rewrite stages through a temp
        table and promotes — the reference's temp-dataset pattern.
        `partition_cols` re-applies a hive layout on the staging
        write; omitting it on a partitioned table would silently
        flatten the directory structure and lose partition pruning."""
        staging = f"{table}.rewrite-{uuid.uuid4().hex[:8]}"
        out = transform(self.read(table))
        self.write(out, staging, "truncate", partition_cols=partition_cols)
        self.promote(staging, table)

    _META_NAME = "_dot_spark_table.json"

    def _record_partition_cols(
        self,
        table: str,
        partition_cols: Sequence[str],
        df: DataFrame,
        merge_schema_with_recorded: bool = False,
    ) -> None:
        """Persist the table's partition spec (and schema DDL) in a
        root-level `_`-prefixed metadata file — the warehouse's
        stand-in for a table format's catalog entry. Layout inference
        from `key=value` directories has AMNESIA: a partitioned table
        emptied by CDC deletes (every partition dir removed) or
        written empty forgets it was partitioned, and the next merge
        would silently flatten it. Spark's parquet reader skips
        `_`-prefixed files, so the marker is invisible to scans.

        On APPEND (``merge_schema_with_recorded``) the recorded DDL
        becomes the UNION of the old record and the batch's schema —
        an append with a narrower or additively-evolved schema (the
        mergeSchema read contract) must not shrink the table's
        recorded schema to the last batch's, or an emptied-table
        read() would come back missing columns. Type conflicts keep
        the first-recorded type (additive evolution only, matching
        what mergeSchema reads tolerate)."""
        ddl = df.schema.simpleString()[7:-1] if df.schema.fields else ""
        if merge_schema_with_recorded:
            prior = self._table_meta(table)
            if prior and prior.get("schema_ddl"):
                ddl = self._merge_ddl(prior["schema_ddl"], df)
        meta = {
            "partition_cols": list(partition_cols),
            "schema_ddl": ddl,
        }
        with open(os.path.join(self.path(table), self._META_NAME), "w") as f:
            json.dump(meta, f)

    def _merge_ddl(self, recorded_ddl: str, df: DataFrame) -> str:
        """Union a recorded schema DDL with an incoming batch schema:
        recorded fields keep their position and type; fields the batch
        adds are appended — the schema the mergeSchema reader would
        see, recorded so the empty-table fallback reflects the TABLE,
        not the last batch."""
        from pyspark.sql.types import StructType

        recorded = self.spark.createDataFrame([], recorded_ddl).schema
        have = {f.name for f in recorded.fields}
        fields = list(recorded.fields) + [
            f for f in df.schema.fields if f.name not in have
        ]
        merged = StructType(fields).simpleString()
        return merged[7:-1]

    def _table_meta(self, table: str) -> dict | None:
        p = os.path.join(self.path(table), self._META_NAME)
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def has_data_files(self, table: str) -> bool:
        """True iff the table directory holds at least one data file
        (metadata `_`/`.` files don't count) — an EMPTIED table (all
        rows CDC-deleted) exists but has none, and reading it would
        fail schema inference."""
        for _, _, files in os.walk(self.path(table)):
            if any(not f.startswith(("_", ".")) for f in files):
                return True
        return False

    def partition_cols_of(self, table: str) -> list[str]:
        """Partition columns of a table: the recorded metadata when
        present (survives an emptied table), else inferred from the
        `key=value` directory levels (outermost first) — the fallback
        for tables written outside Warehouse.write. On a real
        lakehouse this comes from the table format's metadata; the
        local warehouse keeps its own marker."""
        meta = self._table_meta(table)
        if meta is not None:
            return list(meta["partition_cols"])
        cols: list[str] = []
        d = self.path(table)
        while True:
            subdirs = [
                e for e in os.listdir(d)
                if "=" in e and os.path.isdir(os.path.join(d, e))
            ]
            if not subdirs:
                return cols
            keys = {e.split("=", 1)[0] for e in subdirs}
            if len(keys) != 1:
                return cols
            cols.append(keys.pop())
            d = os.path.join(d, subdirs[0])

    def _remove_partition_dir(
        self, table: str, pcols: Sequence[str], vals: Sequence[str | None]
    ) -> None:
        """Remove one hive partition directory, matching on DECODED
        values: Spark %-escapes special characters in `key=value`
        path segments (and writes NULL as __HIVE_DEFAULT_PARTITION__),
        so the on-disk name is matched by unquoting each candidate
        rather than re-implementing the escaper."""
        d = self.path(table)
        for c, v in zip(pcols, vals):
            want = "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
            step = None
            for entry in os.listdir(d):
                if "=" not in entry or not os.path.isdir(os.path.join(d, entry)):
                    continue
                k, raw = entry.split("=", 1)
                if k == c and urllib.parse.unquote(raw) == want:
                    step = os.path.join(d, entry)
                    break
            if step is None:  # already gone (or never existed: pure-insert batch)
                return
            d = step
        shutil.rmtree(d, ignore_errors=True)

    def merge_upsert(
        self,
        updates: DataFrame,
        table: str,
        key_cols: Sequence[str],
        delete_col: str | None = None,
    ) -> None:
        """MERGE INTO semantics for a parquet warehouse (no table
        format): rows in `updates` replace target rows with matching
        keys, unmatched keys insert, and rows with `delete_col` true
        remove the matching target row. The CDC-apply primitive the
        reference's dispositions (S7/S8) can't express — they only
        truncate or append.

        Scale shape — copy-on-write, scoped as narrowly as the layout
        allows:
        - The touched-keys set (one small column tuple per CDC row)
          BROADCASTS into a left-anti join against the target: the
          100 TB target streams through once, never shuffles.
        - On a hive-partitioned table, only partitions present in the
          update batch are read AND rewritten (the untouched ones are
          not even listed): a day-partitioned target applying one
          day's CDC rewrites one partition. Assumes a row's partition
          value is stable across updates — the standard CDC contract;
          a partition-moving update must be expressed as delete +
          insert.
        - Unpartitioned tables stage a full rewrite and promote
          atomically (readers never see a half-merged table).

        Delete semantics: a NULL ``delete_col`` flag means NOT a
        delete (the standard CDC convention — absent flag == change
        row); the row upserts. Partition scoping derives from ALL
        change rows, deletes included, so a partition whose batch
        slice is delete-only is still rewritten; a partition EMPTIED
        by deletes (zero surviving rows — dynamic overwrite cannot
        replace a partition it writes no rows to) has its directory
        removed explicitly.
        """
        key_cols = list(key_cols)
        if delete_col is not None:
            is_delete = F.coalesce(F.col(delete_col), F.lit(False))
            upserts = updates.filter(~is_delete).drop(delete_col)
        else:
            upserts = updates
        touched = updates.select(*key_cols)

        pcols = self.partition_cols_of(table)
        # an EMPTIED target (all rows previously CDC-deleted) has no
        # readable data files: there is nothing to keep or delete, so
        # the merge degenerates to writing the upserts
        target_empty = not self.has_data_files(table)
        if pcols:
            if target_empty:
                (
                    upserts.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(*pcols)
                    .parquet(self.path(table))
                )
                return
            target = self.read(table)
            # scope from ALL change rows: a delete-only partition must
            # still be read and rewritten or its deletes are lost.
            # Both joins are NULL-SAFE (<=>): a NULL partition value
            # is a legitimate hive partition (__HIVE_DEFAULT_PARTITION__),
            # and a plain equi-semi-join would never scope it — its
            # survivors would then be invisible to the rewrite while
            # the emptied-partition sweep (which DOES treat NULL as a
            # value) removed the whole directory: silent data loss.
            touched_parts = updates.select(*pcols).distinct()
            p_cond = _all_null_safe_eq(target, touched_parts, pcols)
            scoped = target.join(F.broadcast(touched_parts), p_cond, "left_semi")
            k_cond = _all_null_safe_eq(scoped, touched, key_cols)
            kept = scoped.join(F.broadcast(touched), k_cond, "left_anti")
            merged = kept.unionByName(upserts)
            emptied: set[tuple] = set()
            if delete_col is not None:
                # Partitions with zero surviving rows never appear in
                # the dynamic-overwrite output, so their stale
                # directories would resurrect the deleted rows. Both
                # collects are bounded by the batch's DISTINCT
                # partition values (CDC-batch-sized, never
                # table-sized), and survivors must come from `merged`
                # BEFORE the write — reading the table back afterward
                # would see exactly the stale directories we're
                # hunting. Cost: one extra pass over the scoped slice,
                # paid only when deletes are possible.
                as_str = [F.col(c).cast("string") for c in pcols]
                survivors = {
                    tuple(r) for r in merged.select(*as_str).distinct().collect()
                }
                emptied = {
                    tuple(r)
                    for r in touched_parts.select(*as_str).distinct().collect()
                } - survivors
            # dynamic partition overwrite: only the partitions present
            # in `merged` are replaced; untouched directories survive
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*pcols)
                .parquet(self.path(table))
            )
            for vals in emptied:
                self._remove_partition_dir(table, pcols, vals)
        else:
            if target_empty:
                merged = upserts
            else:
                target = self.read(table)
                kept = target.join(
                    F.broadcast(touched),
                    _all_null_safe_eq(target, touched, key_cols),
                    "left_anti",
                )
                merged = kept.unionByName(upserts)
            staging = f"{table}.merge-{uuid.uuid4().hex[:8]}"
            self.write(merged, staging, "truncate")
            self.promote(staging, table)

    def compact(self, table: str, target_file_mb: int = 128) -> int:
        """Small-files compaction — the maintenance pass every
        streaming/incremental ingest needs: micro-batch appends leave
        thousands of KB-sized parquet parts, and at 100 TB the
        per-file open/footer overhead (plus the driver's file-listing
        memory) dominates scan cost long before the data does.

        Rewrites the table to ceil(bytes / target_file_mb) files via
        repartition (a full shuffle — correct for a maintenance pass:
        it also re-packs row groups), staged + atomically promoted so
        readers never see a half-compacted table. A hive-partitioned
        layout is detected and PRESERVED: rows re-cluster on the
        partition columns so each partition value lands in few tasks
        (≈ one output file per value) and the staging write re-applies
        partitionBy — compacting must never cost the partition pruning
        the layout exists for. Returns the shuffle file-count budget.
        On a real lakehouse the byte-size listing comes from the table
        format's manifest (Delta/Iceberg) or the object-store listing;
        the local warehouse walks the directory."""
        root = self.path(table)
        total_bytes = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(root)
            for f in files
            if not f.startswith(("_", "."))
        )
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        pcols = self.partition_cols_of(table)
        if pcols:
            self.rewrite(
                table,
                lambda df: df.repartition(n_files, *pcols),
                partition_cols=pcols,
            )
        else:
            self.rewrite(table, lambda df: df.repartition(n_files))
        return n_files

    def zorder(
        self, table: str, cols: Sequence[str], n_files: int = 8, bits: int = 16
    ) -> None:
        """Z-order (Morton-curve) clustering rewrite — the
        multi-dimensional layout pass for scan pruning: rows whose
        values are close in EVERY listed column land in the same
        files, so each file's parquet min/max footer stats are narrow
        on ALL the columns at once and a predicate on any of them
        skips most files/row groups. Linear sort can only do this for
        one leading column; at 100 TB a two-filter workload
        (user_id = X AND value BETWEEN ...) needs the interleaved
        layout or one of the two predicates reads everything.

        Mechanics: each column is min/max-scaled to a bits-wide
        integer (the stats scan is one tiny aggregate; the two driver
        scalars are the documented watermark-style exception), the
        bit-interleaved Morton key orders the rows, and
        repartitionByRange + sortWithinPartitions on that key writes
        n_files clustered files — staged and atomically promoted like
        every other maintenance rewrite. On a lakehouse this is the
        OPTIMIZE ZORDER BY maintenance command; the key expression is
        pure codegen."""
        def xf(df: DataFrame) -> DataFrame:
            key = zorder_key(df, cols, bits=bits)
            return df.repartitionByRange(n_files, key).sortWithinPartitions(key)

        self.rewrite(table, xf, partition_cols=self.partition_cols_of(table))

    # --- S9 CSV checkpoint sink -------------------------------------------

    def write_csv(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        header: bool = True,
    ) -> None:
        """CSV checkpoint sink (S9: okta-sync/main.py:758-789 writes
        a synced-ids checkpoint CSV with write/append modes and
        header control). mode='overwrite' starts a fresh checkpoint,
        'append' extends it. The header option applies to EVERY part
        file (Spark's reader skips one header line per file, so
        per-file headers — not one global header — is the coherent
        multi-file analog of the reference's single-file header).
        Distributed write — each partition lands its own part file,
        no driver funnel."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"write_csv mode must be overwrite/append, got {mode!r}")
        df.write.mode(mode).option("header", str(header).lower()).csv(self.path(table))

    def read_csv(self, table: str, schema: str, header: bool = True) -> DataFrame:
        """Read back a write_csv checkpoint with an explicit schema
        (checkpoints are contract files; inference is a trap)."""
        return (
            self.spark.read.schema(schema)
            .option("header", str(header).lower())
            .csv(self.path(table))
        )

    def write_jsonl(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        compression: str | None = "gzip",
    ) -> None:
        """JSON-Lines corpus sink — the interchange format LLM
        training corpora actually ship in (one JSON object per line,
        gzip part files). Distributed write: each partition lands its
        own .jsonl[.gz] part, so a 100 TB export is embarrassingly
        parallel and downstream loaders stream-decompress per file.
        gzip (not snappy) because jsonl consumers outside the lake
        expect it; pass compression=None for plain text."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"write_jsonl mode must be overwrite/append, got {mode!r}")
        w = df.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        w.json(self.path(table))

    def read_jsonl(self, table: str, schema: str) -> DataFrame:
        """Read back a JSONL corpus with an explicit schema. Schema is
        REQUIRED by design: inference samples the data (an extra scan
        at 100 TB) and silently widens/narrows types between drops —
        corpus files are contract files, same policy as read_csv.
        Compression is sniffed per file from the extension, so mixed
        .jsonl / .jsonl.gz directories read fine."""
        return self.spark.read.schema(schema).json(self.path(table))

    def write_orc(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        """ORC sink — the other JVM-native columnar format; interop
        surface for Hive-era warehouses that standardized on ORC.
        Same distributed shape as parquet: per-partition part files,
        predicate pushdown and column pruning on read."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"write_orc mode must be overwrite/append, got {mode!r}")
        df.write.mode(mode).orc(self.path(table))

    def read_orc(self, table: str) -> DataFrame:
        """Read back an ORC table (self-describing schema, like
        parquet — no contract DDL needed)."""
        return self.spark.read.orc(self.path(table))

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


class ObjectStore:
    """S10 object-store sink (okta-sync/okta_sync_utils.py:398-434:
    path-targeted blob upload into a bucket): a key -> bytes store
    over a local root standing in for the bucket, same call shape as
    a GCS/S3 client (swap the body for client.put_object and nothing
    upstream changes).

    Keys are slash-separated paths; writes are atomic (temp file +
    rename) so a reader never sees a half-uploaded object — the
    property the reference leans on for its checkpoint artifacts.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _fs_path(self, key: str) -> str:
        safe = os.path.normpath(key.lstrip("/"))
        # reject only true escapes ('..' as a path SEGMENT), not keys
        # whose first segment merely begins with two dots
        if safe == ".." or safe.startswith(".." + os.sep):
            raise ValueError(f"object key escapes the bucket: {key!r}")
        return os.path.join(self.root, safe)

    def put_bytes(self, key: str, data: bytes) -> None:
        path = self._fs_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.upload-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.rename(tmp, path)

    def get_bytes(self, key: str) -> bytes:
        with open(self._fs_path(key), "rb") as fh:
            return fh.read()

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._fs_path(key))

    def list(self, prefix: str = "") -> list[str]:
        """Keys under a prefix, sorted (the bucket-listing call).
        In-flight staging files (`.upload-` suffix) are never listed —
        a crashed upload must not surface as a committed object."""
        out = []
        for dirpath, _, files in os.walk(self.root):
            for name in files:
                if ".upload-" in name:
                    continue
                rel = os.path.relpath(os.path.join(dirpath, name), self.root)
                key = rel.replace(os.sep, "/")
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    def put_csv(self, df: DataFrame, key: str, header: bool = True) -> int:
        """Export a DataFrame as ONE csv object (the reference
        uploads single-file artifacts). Spark writes partitioned part
        files; the driver streams them into the object in partition
        order. Only for checkpoint-sized artifacts — a large export
        belongs in Warehouse.write_csv where it stays distributed.
        Returns the object's byte size."""
        import shutil as _sh
        import tempfile

        tmp = tempfile.mkdtemp(prefix="dot_spark_obj_")
        try:
            df.write.mode("overwrite").option("header", str(header).lower()).csv(tmp)
            parts = sorted(
                n for n in os.listdir(tmp) if not n.startswith(("_", "."))
            )
            path = self._fs_path(key)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            staged = f"{path}.upload-{uuid.uuid4().hex[:8]}"
            first = True
            with open(staged, "wb") as out:
                for name in parts:
                    with open(os.path.join(tmp, name), "rb") as fh:
                        payload = fh.read()
                    if header and not first and payload:
                        # drop the per-part header line on concat
                        payload = payload.split(b"\n", 1)[1] if b"\n" in payload else b""
                    if payload:
                        out.write(payload)
                        first = False
            os.rename(staged, path)
            return os.path.getsize(path)
        finally:
            _sh.rmtree(tmp, ignore_errors=True)


def write_observed(
    wh: Warehouse,
    df: DataFrame,
    table: str,
    disposition: str = "truncate",
    null_check_cols: Sequence[str] = (),
) -> dict:
    """Load with FREE data-quality counters: an Observation rides the
    write job, so row count and per-column null counts come back
    without a second pass over the data — at 100 TB the difference
    between "load then re-scan to audit" and "audit while loading".
    Returns the metrics dict ({'n_rows': ..., 'nulls_<col>': ...});
    the caller decides whether to fail the load on them (the
    reference's load-audit slot, okta-sync row-count logging)."""
    from pyspark.sql import Observation

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    obs = Observation(f"load_{table}")
    wh.write(df.observe(obs, *aggs), table, disposition)
    return obs.get
