"""Dump `.explain("formatted")` for queries into plans/<round>/.

Usage: python tools/explain_dump.py <suffix> [query ...]
    suffix: "before" or "after" (file name tail)
    queries: default = the bench HEADLINE list

Writes plans/$DOT_SPARK_PLAN_ROUND/<query>_<suffix>.txt (default r15) — the optimization-round
evidence files the judge checks plan claims against. Uses sf0.1 so
the plans match the benched scale (AQE initial plans; the committed
plan-shape baselines under tests/ stay the CI source of truth)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dot_spark import get_spark  # noqa: E402
from dot_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("DOT_SPARK_PLAN_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dot_spark_explain_dump")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            txt = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
