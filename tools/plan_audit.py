"""Physical-plan audit over the whole query registry.

Prints, for every registered query at sf0.001: the number of parquet
scans, exchanges, sort-merge/hash/broadcast joins, and flags the two
scale anti-patterns — CartesianProduct and BroadcastNestedLoopJoin.
BNLJ is tolerated only for the declared-quadratic oracle baselines
(exact cosine / all-pairs lanes, see ALLOWED_BNLJ in
tests/test_plans.py); a Cartesian product is never acceptable.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(plan: str) -> dict[str, int]:
    return {
        "scans": plan.count("FileSourceScanExec")
        or plan.count("Scan parquet"),
        "exchanges": plan.count("Exchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def main() -> int:
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark
    from aws_glue_data_catalog_replication_utility_spark import queries as Q

    spark = get_spark(app_name="plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or sorted(Q.registry())
    reg = Q.registry()
    rc = 0
    for name in names:
        try:
            counts = audit(physical_plan(reg[name](spark, "/root/testdata/sf0.001")))
        except Exception as e:  # pipeline fixtures may need a side channel
            print(f"{name:32s} ERR {str(e)[:60]}")
            continue
        flag = ""
        if counts["cartesian"]:
            flag, rc = "  <-- CARTESIAN", 1
        elif counts["bnlj"]:
            flag = "  (bnlj)"
        print(
            f"{name:32s} scans={counts['scans']:2d} exch={counts['exchanges']:2d} "
            f"smj={counts['smj']} bhj={counts['bhj']} bnlj={counts['bnlj']}{flag}"
        )
    return rc


if __name__ == "__main__":
    sys.exit(main())
