"""Record HyperLogLog++ accuracy evidence (VERDICT r8 #4).

``a_approx_distinct_users`` is the registry's one rows-only query —
sketches are engine-specific by construction, so DuckDB can't
hash-check it. This tool gives it quantitative evidence instead:
``approx_count_distinct(user_id, rsd)`` vs the exact distinct count,
per event type and overall, at every scale factor directory passed
(default: the driver's sf0.01 and sf0.1, plus /dev/shm/sf1 and
/dev/shm/sf1skew when present). HLL++'s relative standard deviation
is the configured ``rsd`` (default 0.02, the registered query's
setting); the committed floor is ``rsd × safety`` with safety 3 — a
3σ bound a correct implementation should essentially never breach.

Usage::

    python tools/hll_error.py [out_json] [sf_dir ...]

Default out: ``HLL_ERROR_r09.json``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RSD = 0.02
SAFETY = 3.0


def hll_error_report(spark, sf_dir: str, rsd: float = RSD) -> dict:
    """Per-event-type and overall approx-vs-exact distinct counts with
    relative errors. Returns {"sf_dir", "rsd", "groups": [...],
    "max_rel_err"}."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events", ["event_type", "user_id"])
    per = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    overall = ev.agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
        F.count("*").alias("n_events"),
    ).first()
    groups = []
    for r in list(per) + [overall]:
        exact = int(r["exact"])
        approx = int(r["approx"])
        rel = abs(approx - exact) / exact if exact else 0.0
        groups.append(
            {
                "event_type": r["event_type"] if "event_type" in r.asDict() else "__all__",
                "approx": approx,
                "exact": exact,
                "rel_err": round(rel, 6),
                "n_events": int(r["n_events"]),
            }
        )
    return {
        "sf_dir": sf_dir,
        "rsd": rsd,
        "groups": groups,
        "max_rel_err": max(g["rel_err"] for g in groups),
    }


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "HLL_ERROR_r09.json"
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

    spark = get_spark("hll-error")
    reports = []
    for d in sf_dirs:
        rep = hll_error_report(spark, d)
        print(d, "max_rel_err:", rep["max_rel_err"], flush=True)
        reports.append(rep)
    payload = {
        "rsd": RSD,
        "floor": RSD * SAFETY,
        "safety": SAFETY,
        "reports": reports,
        "all_within_floor": all(
            r["max_rel_err"] <= RSD * SAFETY for r in reports
        ),
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
