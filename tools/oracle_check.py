"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, schema (column names), and an order-insensitive value
hash (rows sorted by all columns, values canonicalized).

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "\0"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            # DRIVER PARITY: the official canonicalizer lexsorts all
            # columns in pandas, which raises on ndarray/list cells
            # ("unhashable type"). Fail here the same way so a
            # complex-typed output can never pass locally and then
            # fail the official gate (the r2 c1/mm2 defect).
            raise TypeError(
                f"complex-typed cell {type(v).__name__} is not driver-canonicalizable; "
                "serialize arrays/structs to scalars in the query's final projection"
            )
        return str(v)

    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    # Data-dependent generated-literal oracles (ss3's replayed k-means
    # training) must build their literals from the SAME tables this
    # check runs against — export the dir BEFORE the oracle-building
    # import so a replica run at sf0.001/sf0.1 regenerates matching
    # literals instead of false-mismatching frozen sf0.01 ones.
    os.environ["DOT_SPARK_GATE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from dot_spark import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    passed = failed = skipped = 0
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    for name in names:
        t0 = time.time()
        try:
            # second-channel row accounting (the write_observed
            # discipline, loads.py): an Observation rides the collect
            # job, so the JVM-side aggregated count is checked against
            # BOTH the arrow-collected frame and the oracle — a
            # partial/dropped-batch collect can no longer masquerade
            # as a passing row count.
            obs = Observation(f"gate_{name}_{time.time_ns()}")
            sdf = (
                qs[name](spark, sf_dir)
                .observe(obs, F.count(F.lit(1)).alias("n_rows"))
                .toPandas()
            )
            observed = int(obs.get["n_rows"])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            skipped += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed += 1
            continue
        problems = []
        if observed != len(sdf):
            problems.append(f"observed {observed} vs collected {len(sdf)}")
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif canonical(sdf) != canonical(odf):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            ks = sorted(sdf.columns)
            print("  spark:", sdf.reindex(ks, axis=1).head(3).to_dict("records"))
            if sorted(odf.columns) == ks:
                print("  duck: ", odf.reindex(ks, axis=1).head(3).to_dict("records"))
            failed += 1
        else:
            print(
                f"PASS {name} ({len(sdf)} rows, observed {observed}, "
                f"{time.time()-t0:.1f}s)"
            )
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only, of {len(names)}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
