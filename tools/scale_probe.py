"""One-off scale-probe runner (VERDICT r08 #7): times the heavy lanes
at base_mult and base_mult*factor of a token-namespaced synthetic
corpus and prints one JSON document with per-lane seconds + ratios +
driver RSS high-water. The per-round bench runs the small version of
the same probes (bench.py extras scale_*); this tool produces the big
table recorded in SURVEY.md.

Usage: python tools/scale_probe.py [--base-mult 120] [--factor 10]
       [--sf DIR] [--lanes minhash_cc,close,zorder]
(base_mult 120 on sf0.1 documents = 600k docs, so factor 10 probes the
~6M-row corpus the round-8 verdict asked for.)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--base-mult", type=int, default=120)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--lanes", default="minhash_cc,close,zorder")
    ap.add_argument("--zorder-base-mult", type=int, default=1)
    ap.add_argument("--zorder-divisor", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from aws_glue_data_catalog_replication_utility_spark.scaleprobe import run_probe
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=args.cpus)
    work = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        out = run_probe(
            spark,
            args.sf,
            work,
            base_mult=args.base_mult,
            factor=args.factor,
            lanes=tuple(args.lanes.split(",")),
            zorder_base_mult=args.zorder_base_mult,
            zorder_divisor=args.zorder_divisor,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
