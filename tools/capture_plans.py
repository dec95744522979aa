"""Capture `.explain("formatted")` for registry queries into plans/<dir>.

Usage: python tools/capture_plans.py --dir plans/r12 --suffix before [query ...]

Side-effecting fixtures (q12/q13/q34/q55 build scratch stores or side
channels) run their setup as part of building the DataFrame; the explain
itself does not execute the final query. Uses sf0.1 (the bench scale) so
the captured plans are the benched plans.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from aws_glue_data_catalog_replication_utility_spark import queries as Q
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(app_name="capture-plans", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    names = args.names or sorted(reg)
    os.makedirs(args.dir, exist_ok=True)
    for name in names:
        try:
            df = reg[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep going
            txt = f"ERROR building plan: {e}\n"
        out = os.path.join(args.dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(txt)
        print(f"wrote {out} ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
