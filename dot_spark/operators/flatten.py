"""Nested-data flattening operators (reference §2.3 N1-N6).

The reference's row-builder loops (woo-sync/main.py:570-1129) take
one nested API document and emit N typed rows — a hand-rolled UDTF.
Spark-first, every one of them is a column expression or explode:
whole-stage codegen applies, no Python executes per row, and the
operators parallelize per-partition with zero driver state.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def explode_with_parent(
    df: DataFrame,
    array_col: str,
    parent_cols: Sequence[str],
    child_alias: str = "child",
    with_position: bool = False,
) -> DataFrame:
    """Array explode carrying parent keys (N2: line_items -> order
    items, woo-sync/main.py:679-819; parent-id stamp :693-697).

    posexplode when the child's position matters (the reference's
    "subsequent bundle members" logic depends on document order,
    which a distributed engine must materialize as a column).
    """
    cols = [F.col(c) for c in parent_cols]
    if with_position:
        return df.select(*cols, F.posexplode(array_col).alias("pos", child_alias))
    return df.select(*cols, F.explode(array_col).alias(child_alias))


def kv_pivot(
    df: DataFrame,
    entity_col: str,
    key_col: str,
    value_col: str,
    keys: Mapping[str, object],
) -> DataFrame:
    """Key-value meta pivot (N3: woo-sync/main.py:845-892 lifts ~17
    known meta_data keys to typed columns with defaults).

    Implemented as ONE conditional aggregation (max-when per known
    key) — a single shuffle on the entity key with map-side partial
    aggregation, instead of the reference's per-row dict scans.
    ``keys`` maps key name -> default value (None for no default).
    """
    aggs = []
    for k, default in keys.items():
        expr = F.max(F.when(F.col(key_col) == k, F.col(value_col)))
        if default is not None:
            expr = F.coalesce(expr, F.lit(default))
        aggs.append(expr.alias(k))
    return df.groupBy(entity_col).agg(*aggs)


def element_first_last(df: DataFrame, array_col: str, out_prefix: str = "elem") -> DataFrame:
    """First/last array element (N4: options[0] woo-sync/main.py:1029;
    last-discount-wins :613-618). try_element_at is codegen'd and
    yields NULL on an empty array instead of the ANSI out-of-bounds
    error (the reference's .get()-style tolerance); negative index =
    last without knowing the length."""
    return df.withColumns(
        {
            f"{out_prefix}_first": F.try_element_at(F.col(array_col), F.lit(1)),
            f"{out_prefix}_last": F.try_element_at(F.col(array_col), F.lit(-1)),
        }
    )


def sticky_carry(
    df: DataFrame,
    value_col: str | Column,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "carried",
) -> DataFrame:
    """Conditional row-scoped carry (N5: sku from the non-bundled
    line item applied to subsequent bundle-member rows,
    woo-sync/main.py:683-688,748-749).

    last(ignorenulls) over a running frame — the distributed
    restatement of the reference's loop-carried variable. Needs an
    explicit order column (document order is not free in a cluster).
    """
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(col, ignorenulls=True).over(w))
