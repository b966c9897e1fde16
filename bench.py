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
    # dd4b (stop-shingle capped) is the 100 TB path; the unguarded
    # exact dd4 stays registered as the gold standard but is not the
    # headline (a boilerplate-heavy corpus makes its df² blow up)
    "dd4b_ngram_jaccard_capped",
    # dd5b (bucketed equi-join) is the 100 TB path; brute-force dd5
    # stays registered as the gold standard but is not the headline
    "dd5b_bucketed_neardup",
    "dd6_decontamination",
    "t2_quality_score",
    "t4_fingerprint",
    "t9_tfidf_topterms",
    "w6_sessionize",
    "ss1_cosine_topk",
    "ss2_ivf_topk",
    # classification over the whole run table
    "c1_classify_runs",
]

# The previous round's headline set (BENCH_r02.json), so the artifact
# itself carries a round-over-round comparable number: the r1->r2
# totals were apples-to-oranges because the suite grew by 5 queries.
# "common_subset" below sums only queries present in BOTH rounds.
PREV_ROUND = "BENCH_r02"
PREV_ROUND_QUERIES = [
    "w1_dedup_keep_latest", "j5_parent_child_join", "j7_star_join_rollup",
    "j8_asof_join", "a9_hypertable_rollup", "a3_conditional_agg",
    "n2_explode_tokens", "s1_scan_projection", "n5_sticky_carry",
    "a5_collect_sorted_list", "dd1_exact_dedup", "dd2_minhash_lsh_candidates",
    "dd3_simhash", "dd4b_ngram_jaccard_capped", "dd5b_bucketed_neardup",
    "dd6_decontamination", "t2_quality_score", "t4_fingerprint",
    "t9_tfidf_topterms", "w6_sessionize", "ss1_cosine_topk", "ss2_ivf_topk",
    "c1_classify_runs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("dot_spark_bench")

    # JVM + codegen warmup on a trivial action so query timings
    # measure the engine, not startup.
    spark.range(1000).count()

    # INTERLEAVED rounds (q1..qN, q1..qN, ...), per-query min of 3:
    # the box sees intermittent multi-second CPU-steal windows from
    # co-tenants, and interleaving decorrelates a steal window from
    # any single query (back-to-back repeats would let one window
    # poison both samples of the same query). Round 1 additionally
    # pays plan compilation + JIT. The per-query min is the
    # steady-state engine cost — the number that extrapolates to a
    # real cluster.
    n_rounds = int(os.environ.get("DOT_SPARK_BENCH_ROUNDS", "3"))
    names = [n for n in HEADLINE if n in QUERIES]
    best: dict[str, float] = {}
    for _ in range(n_rounds):
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, dt), dt)
    timings = {name: round(best[name], 3) for name in names}

    total = round(sum(timings.values()), 3)
    common = [n for n in names if n in PREV_ROUND_QUERIES]
    print(
        json.dumps(
            {
                "metric": "dot_spark headline suite runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n": n_rounds,
                "common_subset": {
                    "vs": PREV_ROUND,
                    "n_queries": len(common),
                    "total": round(sum(timings[n] for n in common), 3),
                    "added_since": sorted(set(names) - set(PREV_ROUND_QUERIES)),
                    "removed_since": sorted(set(PREV_ROUND_QUERIES) - set(names)),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
