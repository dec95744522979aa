"""Split each registry query's wall time into BUILD (the fn call:
driver-side plan construction plus any setup jobs / persists the fixture
runs) and EXEC (the noop sink write of the returned DataFrame).

Usage: python tools/profile_queries.py [--sf DIR] [--cpus N] [--n N] [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from aws_glue_data_catalog_replication_utility_spark import queries as Q
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(app_name="profile", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    names = args.names or sorted(reg)

    # warm-up (same expression families as bench.py)
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy().count().collect()

    print(f"{'query':34s} {'build':>7s} {'exec':>7s} {'total':>7s}  (medians of n={args.n})")
    for name in names:
        builds, execs = [], []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = reg[name](spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = statistics.median(builds), statistics.median(execs)
        print(f"{name:34s} {b:7.2f} {e:7.2f} {b + e:7.2f}   raw_build={[round(x,2) for x in builds]} raw_exec={[round(x,2) for x in execs]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
