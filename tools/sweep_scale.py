"""Full-registry scale sweep with a committed JSON artifact.

Same dual-gate comparison as tools/sweep_correctness.py (exact-value +
pandas-roundtrip driver-hash replica, tests/oracle.py), but records a
per-query {ok, wall_sec, rows} map to a JSON file — the committed
evidence for the sf1 / sf1-skew rehearsals (VERDICT r7 #6). wall_sec
includes the DuckDB oracle side, which dominates the minhash-family
queries at sf1 (the all-pairs ground-truth SQL is quadratic); the
engine side is seconds.

Usage::

    python tools/sweep_scale.py /dev/shm/sf1skew SWEEP_sf1skew_r08.json \
        [--note "..."] [--skip name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doin_fine_ance__spark.queries import load_registry  # noqa: E402
from doin_fine_ance__spark.session import get_spark  # noqa: E402
from tests.oracle import compare_query  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out")
    ap.add_argument("--note", default="")
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--only", nargs="*", default=[],
                    help="substring filters (smoke runs)")
    args = ap.parse_args()

    queries, oracles = load_registry()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in queries if n in oracles and n not in args.skip]
    if args.only:
        names = [n for n in names if any(f in n for f in args.only)]
    no_oracle = [n for n in queries if n not in oracles]
    results: dict[str, dict] = {}
    fails = []
    for i, name in enumerate(names):
        t0 = time.time()
        rows = None
        try:
            ok, detail = compare_query(spark, name, args.sf_dir,
                                       queries, oracles)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        if ok:
            # detail is like "ok (N rows)" — keep the parsed count
            import re

            mt = re.search(r"(\d+) rows", str(detail))
            rows = int(mt.group(1)) if mt else None
        entry = {"ok": bool(ok), "wall_sec": round(dt, 2)}
        if rows is not None:
            entry["rows"] = rows
        if not ok:
            entry["detail"] = str(detail)[:300]
            fails.append(name)
        results[name] = entry
        print(f"[{i + 1:3d}/{len(names)}] {'ok ' if ok else 'FAIL'} "
              f"{name:40s} {dt:7.2f}s", flush=True)
    summary = (f"{len(names) - len(fails)}/{len(names)} oracle-backed green; "
               f"{len(no_oracle)} rows-only: {', '.join(no_oracle)}")
    body = {
        "sf_dir": args.sf_dir,
        "summary": summary,
        "note": args.note,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(body, f, indent=1)
        f.write("\n")
    print(summary)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
