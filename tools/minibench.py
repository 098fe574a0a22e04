"""Mini-bench: time a NAMED SUBSET of headline queries with the exact
bench.py methodology (JMH-style sf0.001 warmup of the same queries,
noop sink, min-of-N, per-query gc + JVM System.gc between queries) so
per-change before/after numbers are directly comparable to the full
bench without paying its 72-query wall time.

Usage: python tools/minibench.py q1_pricing_summary d_exact_dedup ...
       [--repeat 3] [--sf-dir /root/testdata/sf0.1] [--out FILE]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doin_fine_ance__spark.queries import load_registry  # noqa: E402
from doin_fine_ance__spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    queries, _ = load_registry()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")

    from doin_fine_ance__spark.sources.testdata import load_table

    # same session warmup as bench.py: Python worker pool full-width,
    # parquet footers, then every named query once at the warm SF
    queries["a6_count_total"](spark, args.sf_dir).collect()
    queries["t_simhash_fingerprints"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        load_table(spark, args.sf_dir, t).count()
    for name in args.names:
        queries[name](spark, args.warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    gc.collect()

    timings: dict[str, float] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"minibench: {name}")
        best = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            del df
            gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        timings[name] = round(best, 4)
        print(f"{name:40s} {best:7.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "repeat": args.repeat,
                       "queries": timings}, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
