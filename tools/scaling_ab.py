"""32-vs-8-core scaling A/B for registry queries (VERDICT r12 items 1/9).

The driver's r12 bench read q19 at 11.45 s on 32 cores vs 2.28 s on 8
on identical code — either phantom box load hitting the many-Python-
worker configuration hardest, or a real oversubscription problem. This
tool decides which: it runs the named queries under fresh local[32] and
local[8] sessions ALTERNATELY (ABBA order across rounds, so box drift
cannot masquerade as a core-count effect), times each query end-to-end
with the noop sink (median of N), and records a scan sentinel per leg.
`--load M` additionally spawns M busy-loop processes for the whole
run to reproduce the "loaded box" condition deliberately.

Usage:
  PYTHONPATH=/root/repo python tools/scaling_ab.py \
      --queries q19_lsh_candidate_recall,q21_cosine_topk \
      --rounds 4 --runs 3 [--load 16] [--out /tmp/scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sentinel_once(spark, sf_dir: str) -> float:
    from pyspark.sql import functions as F

    probe = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("double")).alias("s"),
            F.avg(F.col("l_extendedprice").cast("double")).alias("a"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    t0 = time.perf_counter()
    probe.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _run_leg(cpus: int, queries: list[str], runs: int, sf_dir: str) -> dict:
    """One fresh local[cpus] session: sentinel + median-of-runs per query."""
    from aws_glue_data_catalog_replication_utility_spark import queries as Q
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_ab_{cpus}", cpus=cpus)
    reg = Q.registry()
    # session warm-up: untimed sentinel passes absorb first-run codegen
    for _ in range(2):
        _sentinel_once(spark, sf_dir)
    leg = {"cpus": cpus, "sentinel": min(_sentinel_once(spark, sf_dir) for _ in range(3))}
    per_q: dict[str, list[float]] = {}
    for name in queries:
        fn = reg[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        per_q[name] = times
    leg["runs"] = per_q
    leg["median"] = {k: statistics.median(v) for k, v in per_q.items()}
    spark.stop()
    # frames persisted by the last query belong to the stopped context:
    # drop the references without calling unpersist on a dead JVM handle
    Q._PERSISTED.clear()
    return leg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", default="32,8")
    ap.add_argument("--load", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    cpu_pair = [int(c) for c in args.cpus.split(",")]

    burners: list[subprocess.Popen] = []
    try:
        for _ in range(args.load):
            burners.append(
                subprocess.Popen(
                    [sys.executable, "-c", "while True:\n    pass"],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
            )
        legs = []
        for r in range(args.rounds):
            # ABBA: alternate which core count goes first each round
            order = cpu_pair if r % 2 == 0 else list(reversed(cpu_pair))
            for cpus in order:
                leg = _run_leg(cpus, queries, args.runs, sf_dir)
                leg["round"] = r
                legs.append(leg)
                print(
                    f"[round {r}] local[{cpus}] sentinel={leg['sentinel']} "
                    + " ".join(f"{k}={v}" for k, v in leg["median"].items()),
                    flush=True,
                )
    finally:
        for p in burners:
            p.kill()

    # aggregate: per query, median across rounds at each core count
    summary: dict[str, dict] = {}
    for q in queries:
        by_cpus = {
            c: statistics.median(
                m for leg in legs if leg["cpus"] == c for m in [leg["median"][q]]
            )
            for c in cpu_pair
        }
        hi, lo = cpu_pair[0], cpu_pair[-1]
        summary[q] = {
            **{f"median@{c}": by_cpus[c] for c in cpu_pair},
            f"ratio_{lo}v{hi}": round(by_cpus[lo] / by_cpus[hi], 2)
            if by_cpus[hi]
            else None,
        }
    out = {
        "load": args.load,
        "rounds": args.rounds,
        "runs": args.runs,
        "queries": summary,
        "legs": legs,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
