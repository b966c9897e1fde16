"""Solo re-timing of named queries: min of N noop-sink runs each,
fresh plan per run (bench methodology, one query at a time).

Usage: python tools/solo_time.py [-n N] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dot_spark import get_spark  # noqa: E402
from dot_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dot_spark_solo_time")
    spark.range(1000).count()
    out: dict[str, object] = {}
    for name in args:
        runs = []
        for _ in range(n):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
