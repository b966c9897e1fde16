"""dot_spark — a PySpark-native data-processing engine.

Re-expresses the query/data-processing capabilities of the reference
ELT stack (CruGlobal/dot — pandas + BigQuery SQL + Cloud Workflows)
as idiomatic Spark: DataFrame/SQL batch operators, window dedup,
Structured Streaming event routing, plus large-scale training-data
pipeline operators (dedup families, similarity search, text analysis).

Design rules (enforced throughout):
- Declarative DataFrame plans only; Catalyst does pushdown/pruning.
- No row-at-a-time Python UDFs in hot paths; Pandas UDFs when Python
  is unavoidable (vector math), built-in functions otherwise.
- Every operator is partition-parallel and shuffle-aware: broadcast
  small dims, pre-aggregate before shuffles, avoid driver collects.
"""

from dot_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
