"""Sweep the split-guard's target partition count at a fixed core count
(anti-scaling diagnosis, VERDICT r12 item 1). Patches the queries
module's `ensure_min_parallelism` binding to force a given target and
times the named queries interleaved (variant order rotates per round).

Usage:
  PYTHONPATH=/root/repo python tools/split_target_sweep.py \
      --queries q19_lsh_candidate_recall,q27_blob_features \
      --targets 32,8,4,2 --rounds 3 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--targets", default="32,8,4,2")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    targets = [int(t) for t in args.targets.split(",")]

    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark import queries as Q
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(app_name="split_sweep", cpus=args.cpus)
    reg = Q.registry()

    forced = {"t": None}

    def patched(df, fraction: float = 1.0, keys=None):
        target = forced["t"]
        if target is None:
            target = max(1, int(spark.sparkContext.defaultParallelism * fraction))
        if df._jdf.rdd().getNumPartitions() < target:
            if keys:
                return df.repartition(target, F.xxhash64(*[F.col(k) for k in keys]))
            return df.repartition(target)
        return df

    Q.ensure_min_parallelism = patched

    # warm-up
    for name in queries:
        reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    res: dict[str, dict[int, list[float]]] = {q: {t: [] for t in targets} for q in queries}
    for r in range(args.rounds):
        order = targets[r % len(targets):] + targets[: r % len(targets)]
        for t in order:
            forced["t"] = t
            for name in queries:
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    df = reg[name](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    res[name][t].append(round(time.perf_counter() - t0, 3))
        print(f"round {r} done", flush=True)

    out = {
        q: {t: round(statistics.median(v), 3) for t, v in byt.items()}
        for q, byt in res.items()
    }
    print(json.dumps({"medians": out, "raw": res}))
    spark.stop()


if __name__ == "__main__":
    main()
