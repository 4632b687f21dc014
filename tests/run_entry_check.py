"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, comparing row count, column names, and (order-insensitively)
values. Exact for ints/strings/timestamps; floats compared bit-exact first,
then at 1e-12 relative as diagnostic. Exit 0 iff everything matches.

Usage: python tests/run_entry_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duck={len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    a = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    b = ddf[dcols].sort_values(dcols, kind="mergesort").reset_index(drop=True)
    if len(a) != len(b):
        return problems
    for c in scols:
        av, bv = a[c], b[c]
        for i in range(len(av)):
            x, y = av.iloc[i], bv.iloc[i]
            if isinstance(x, float) or isinstance(y, float):
                xf, yf = float(x), float(y)
                if xf != yf and not (math.isnan(xf) and math.isnan(yf)):
                    rel = abs(xf - yf) / max(abs(xf), abs(yf), 1e-300)
                    problems.append(
                        f"col {c} row {i}: spark={xf!r} duck={yf!r} rel={rel:.2e}"
                    )
                    break
            else:
                if pd.isna(x) and pd.isna(y):
                    continue
                if x != y:
                    problems.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                    break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from access_log_aggregator_spark.session import get_spark

    spark = get_spark(app_name="entry-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    from access_log_aggregator_spark.queries import TABLES

    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows, cols={list(sdf.columns)} (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
        else:
            print(f"OK    {name}: {len(sdf)} rows")

    # smoke-check entry()
    try:
        res = entry_mod.entry(spark)
        n = res.count()
        print(f"ENTRY ok: {n} rows, schema={[f.name for f in res.schema.fields]}")
    except Exception as e:
        print(f"ENTRY FAIL: {e}")
        failures += 1

    spark.stop()
    print("RESULT:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
