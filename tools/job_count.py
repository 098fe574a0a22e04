"""Count Spark jobs a query schedules (the fixed-latency tax meter).

VERDICT r12 "Next round" #3: at sf0.1 a 21-job query pays ~0.2 s of
pure scheduling per job — most of its wall time. This tool pins the
job count per named query so a "fewer eager jobs" change has committed
before/after evidence: run the query once (noop sink) inside a job
group and count the group's job ids via the status tracker.

Usage: python tools/job_count.py d_containment_prefix [more...]
       [--sf-dir /root/testdata/sf0.1] [--repeat 2]

The first (warmup) execution is discarded — broadcast/AQE warmup and
Python worker forks would inflate it; the MIN job count over the timed
repeats is reported (job count is deterministic per plan; min guards
against a stray concurrent job landing in the group).
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doin_fine_ance__spark.queries import load_registry  # noqa: E402
from doin_fine_ance__spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    queries, _ = load_registry()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("job-count")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    for name in args.names:
        # warmup (uncounted): worker forks, broadcast warm, JIT
        queries[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        for i in range(args.repeat):
            group = f"jobcount-{name}-{i}"
            sc.setJobGroup(group, name)
            df = queries[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            best = n_jobs if best is None else min(best, n_jobs)
            del df
            gc.collect()
        print(f"{name:40s} jobs={best}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
