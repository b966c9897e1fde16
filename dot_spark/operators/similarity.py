"""Similarity search over embedding columns (array<float>).

Beyond-reference surface: approximate-nearest-neighbor primitives a
training-data pipeline needs (near-dup mining, retrieval eval).

- `cosine` is a pure column expression (zip_with product + aggregate
  fold), computed in double, JVM-side — no Python, no Arrow transfer.
- `brute_force_topk` is the exact baseline: score every
  (query, candidate) pair, rank per query. Correct everywhere;
  quadratic. Use with a small broadcast query set.
- `ivf_topk` is the scale path: candidates are pruned to the query's
  coarse cell (precomputed bucket column — IVF cell id from any
  assignment, e.g. k-means or an LSH sign signature), turning the
  cross join into an equi-join on the cell key.

Ranking determinism: ranks are computed over (round(cos, 6) DESC,
id ASC) so distributed float summation cannot reorder near-ties
differently between runs or engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, folded left-to-right in
    double precision (deterministic order => engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns as a column expression."""
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query over the whole corpus.

    The query side is broadcast (it is small by assumption), so the
    corpus never shuffles for the scoring pass; the only exchange is
    the per-query rank. With Q queries the scored set is Q*N rows —
    at large Q*N switch to ivf_topk or pre-aggregate per-partition
    local top-k before the global rank.
    """
    scored = F.broadcast(queries).crossJoin(corpus).withColumn(
        "cos_sim", F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    bucket_col: str,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF-style pruned top-k: score only corpus vectors in the
    query's coarse cell (both sides carry `bucket_col` — the
    inverted-file cell assignment).

    Equi-join on the cell key: each side shuffles once, scored pairs
    drop from Q*N to Q*(N/cells) on balanced cells. Recall depends on
    the quantizer; probe more cells by unioning additional
    (query, cell) assignments before the join.
    """
    scored = queries.join(corpus, on=bucket_col).withColumn(
        "cos_sim", F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )
