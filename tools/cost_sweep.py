"""One-pass wall-clock sweep of EVERY registered query — the outlier
hunter that found pl7's hidden 52 s (NOTES_r13 §13).

The bench tracks a stable headline subset for round-over-round
comparability; this sweeps the WHOLE registry once (noop sink, plan
compile included) and prints per-query seconds sorted descending plus
the total, so a query whose cost silently balloons outside the
headline is a one-command discovery instead of a profiling session.
Single-shot numbers on a steal-prone box are ballpark — use bench.py
--ab for trusted comparisons; this exists to spot 5-50x outliers,
which survive any noise.

Usage: python tools/cost_sweep.py [sf_dir]   (default sf0.1)
Prints one JSON line: {"total": s, "n": n, "queries": {...}, "errors": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dot_spark import get_spark
    from dot_spark.queries import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dot_spark_cost_sweep")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:  # isolate: one broken query, one row
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
    ordered = dict(sorted(times.items(), key=lambda kv: kv[1], reverse=True))
    print(
        json.dumps(
            {
                "total": round(sum(times.values()), 1),
                "n": len(times),
                "sf_dir": sf_dir,
                "queries": ordered,
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
