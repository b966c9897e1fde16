"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query materializes through the "noop" sink so the whole plan
executes (count() alone would let Catalyst prune work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dot_spark import get_spark
from dot_spark.queries import QUERIES

# Headline set: the operators that dominate real pipeline cost —
# window dedup, the big parent-child join, group aggregation,
# explode fan-out, and the scan with pushdown.
HEADLINE = [
    "w1_dedup_keep_latest",
    "j5_parent_child_join",
    "j7_star_join_rollup",
    "j8_asof_join",
    "a9_hypertable_rollup",
    "a3_conditional_agg",
    "n2_explode_tokens",
    "s1_scan_projection",
    "n5_sticky_carry",
    "a5_collect_sorted_list",
    # training-data pipeline extensions
    "dd1_exact_dedup",
    "dd2_minhash_lsh_candidates",
    "dd3_simhash",
    "dd4_ngram_jaccard",
    "dd5_embedding_neardup",
    "t2_quality_score",
    "t4_fingerprint",
    "ss1_cosine_topk",
    "ss2_ivf_topk",
    # classification over the whole run table
    "c1_classify_runs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("dot_spark_bench")

    # JVM + codegen warmup on a trivial action so query timings
    # measure the engine, not startup.
    spark.range(1000).count()

    # Two measured executions per query, report the min: run 1 pays
    # plan compilation + JIT, and the local box sees intermittent CPU
    # steal from co-tenants — min-of-2 is the steady-state engine
    # cost, which is the number that extrapolates to a real cluster.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        best = None
        for _ in range(2):
            df = QUERIES[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dot_spark headline suite runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
