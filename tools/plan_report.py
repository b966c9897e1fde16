"""Print the scale audit (shuffle count, Python-boundary ops, join
strategies, scan pushdown) for every registered query.

Usage: python tools/plan_report.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dot_spark import get_spark  # noqa: E402
from dot_spark.plans import audit  # noqa: E402
from dot_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or sorted(QUERIES)
    spark = get_spark("dot_spark_plan_report")
    for name in names:
        try:
            info = audit(QUERIES[name](spark, sf_dir))
        except Exception as exc:  # streaming-only entries etc.
            info = {"error": str(exc).splitlines()[0][:120]}
        print(json.dumps({"query": name, **info}))


if __name__ == "__main__":
    main()
