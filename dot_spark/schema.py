"""Schema alignment & normalization (reference P1/P2/P7/P8).

The reference's ``match_schema`` (okta-sync/main.py:544-584) casts
columns present in both frame and schema, adds missing columns as
typed nulls (:573-577), and drops columns not in the schema
(:580-582). In Spark that is exactly one projection — Catalyst folds
the casts into the scan and prunes dropped columns out of the
parquet read entirely.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def align_schema(df: DataFrame, schema: Mapping[str, str]) -> DataFrame:
    """Project df onto ``schema`` (name -> Spark SQL type string).

    - column in both: cast to declared type
    - column missing: typed NULL (okta-sync/main.py:573-577)
    - column extra:   dropped   (okta-sync/main.py:580-582)
    """
    cols: list[Column] = []
    have = set(df.columns)
    for name, dtype in schema.items():
        if name in have:
            # try_cast: malformed values become NULL (the reference's
            # pd.to_datetime(errors='coerce') / BigQuery autocoerce
            # semantics) instead of failing the job under ANSI mode.
            cols.append(F.col(name).try_cast(dtype).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def positional_projection(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Keep the first len(names) columns and rename (reference P2:
    headerless-CSV positional columns, process-geography/main.py:162,
    248-252)."""
    keep = df.columns[: len(names)]
    return df.select(*keep).toDF(*names)


# The reference's custom NA token list deliberately EXCLUDES "NA"
# (Namibia's country code is real data): process-geography/main.py:115-137.
DEFAULT_NA_TOKENS = ("", "NULL", "null", "n/a", "#N/A", "NaN", "nan", "None", "<NA>")

# MySQL zero-datetime sentinel -> NULL: woo-sync/main.py:272-273.
ZERO_DATETIME_SENTINEL = "0000-00-00 00:00:00"


def normalize_sentinels(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    na_tokens: Sequence[str] = DEFAULT_NA_TOKENS,
    extra_sentinels: Sequence[str] = (ZERO_DATETIME_SENTINEL,),
) -> DataFrame:
    """Replace sentinel string values with NULL (reference P7).

    Pure column expressions — whole-stage codegen applies; no UDF.
    """
    tokens = list(na_tokens) + list(extra_sentinels)
    columns = columns or [c for c, t in df.dtypes if t == "string"]
    out = df
    for c in columns:
        out = out.withColumn(c, F.when(F.col(c).isin(tokens), F.lit(None)).otherwise(F.col(c)))
    return out


def with_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """COALESCE fallbacks for defaulted field extraction (reference
    P8: .get(key, default) chains, woo-sync/main.py:699-702)."""
    out = df
    for c, v in defaults.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out
