"""Snapshot `.explain("formatted")` for named headline queries into
plans/<round>/<query>_<tag>.txt — the before/after evidence files the
optimization rounds commit (judge checks plan claims against these).

Usage: python tools/plan_snapshot.py <tag> <query> [<query> ...]
       [--round r12] [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doin_fine_ance__spark.queries import load_registry  # noqa: E402
from doin_fine_ance__spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="before | after")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--round", default="r12")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    queries, _ = load_registry()
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = queries[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
