"""Record approx_percentile (GK sketch) accuracy evidence.

Spark's ``approx_percentile(col, q, accuracy)`` is the 100 TB default
for quantiles (the exact ``percentile`` holds a per-group multiset);
its contract is a RANK guarantee: the returned value's rank is within
``N / accuracy`` of ``q * N`` (Greenwald-Khanna). This tool measures
that directly — for each probe quantile it computes the returned
value's true rank interval ``[count(x < v), count(x <= v)] / N`` and
records the distance from ``q`` — at every scale directory passed,
overall and per order-status group. The committed floor is
``safety / accuracy`` with safety 2 (the theorem allows 1.0x; the
margin absorbs interpolation at ties).

Usage::

    python tools/quantile_error.py [out_json] [sf_dir ...]

Default out: ``QUANTILE_ERROR_r09.json``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACCURACY = 1000
SAFETY = 2.0
PROBES = [0.25, 0.5, 0.75, 0.9, 0.99]


def quantile_error_report(spark, sf_dir: str, accuracy: int = ACCURACY) -> dict:
    """Rank error of approx_percentile vs the exact order statistics,
    per order-status group and overall. Returns {"sf_dir", "accuracy",
    "groups": [...], "max_rank_err"}."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.sources.testdata import load_table

    o = load_table(spark, sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    qs = ", ".join(str(q) for q in PROBES)
    approx = (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr(
                f"approx_percentile(o_totalprice, array({qs}), {accuracy})"
            ).alias("vals"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    overall = o.agg(
        F.expr(f"approx_percentile(o_totalprice, array({qs}), {accuracy})").alias(
            "vals"
        ),
        F.count("*").alias("n"),
    ).first()

    groups = []
    for r in list(approx) + [overall]:
        status = r["o_orderstatus"] if "o_orderstatus" in r.asDict() else "__all__"
        scoped = (
            o if status == "__all__" else o.filter(F.col("o_orderstatus") == status)
        )
        # one pass: for every probe value, ranks strictly-below and
        # at-or-below (the value's true rank INTERVAL — ties make it
        # an interval, and the guarantee only requires intersection)
        aggs = []
        for i, v in enumerate(r["vals"]):
            aggs.append(
                F.sum(F.when(F.col("o_totalprice") < float(v), 1).otherwise(0)).alias(
                    f"lo{i}"
                )
            )
            aggs.append(
                F.sum(F.when(F.col("o_totalprice") <= float(v), 1).otherwise(0)).alias(
                    f"hi{i}"
                )
            )
        ranks = scoped.agg(*aggs).first()
        n = int(r["n"])
        for i, q in enumerate(PROBES):
            lo, hi = int(ranks[f"lo{i}"]) / n, int(ranks[f"hi{i}"]) / n
            # distance from q to the value's rank interval
            err = max(0.0, q - hi, lo - q)
            groups.append(
                {
                    "group": status,
                    "q": q,
                    "value": float(r["vals"][i]),
                    "rank_interval": [round(lo, 6), round(hi, 6)],
                    "rank_err": round(err, 6),
                    "n": n,
                }
            )
    return {
        "sf_dir": sf_dir,
        "accuracy": accuracy,
        "groups": groups,
        "max_rank_err": max(g["rank_err"] for g in groups),
    }


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "QUANTILE_ERROR_r09.json"
    sf_dirs = sys.argv[2:] or [
        d
        for d in (
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/dev/shm/sf1",
            "/dev/shm/sf1skew",
        )
        if os.path.isdir(d)
    ]

    from doin_fine_ance__spark.session import get_spark

    spark = get_spark("quantile-error")
    reports = []
    for d in sf_dirs:
        rep = quantile_error_report(spark, d)
        print(d, "max_rank_err:", rep["max_rank_err"], flush=True)
        reports.append(rep)
    floor = SAFETY / ACCURACY
    payload = {
        "accuracy": ACCURACY,
        "floor": floor,
        "safety": SAFETY,
        "probes": PROBES,
        "reports": reports,
        "all_within_floor": all(r["max_rank_err"] <= floor for r in reports),
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({k: payload[k] for k in ("floor", "all_within_floor")}))


if __name__ == "__main__":
    main()
