"""Driver-style correctness sweep: every oracle-backed registered query
vs its DuckDB oracle at a given SF, using tests/oracle.py's dual-gate
comparison (exact-value + pandas-roundtrip replica of the driver hash).

Usage: python tools/sweep_correctness.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doin_fine_ance__spark.queries import load_registry  # noqa: E402
from doin_fine_ance__spark.session import get_spark  # noqa: E402
from tests.oracle import compare_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    queries, oracles = load_registry()
    spark = get_spark()
    names = [n for n in queries if n in oracles]
    if name_filter:
        names = [n for n in names if any(f in n for f in name_filter)]
    no_oracle = [n for n in queries if n not in oracles]
    fails = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            ok, detail = compare_query(spark, name, sf_dir, queries, oracles)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        tag = "ok " if ok else "FAIL"
        print(f"[{i + 1:3d}/{len(names)}] {tag} {name:40s} {dt:6.2f}s  {detail[:160]}",
              flush=True)
        if not ok:
            fails.append((name, detail))
    print(f"\n{len(names) - len(fails)}/{len(names)} oracle-backed green; "
          f"{len(no_oracle)} rows-only: {no_oracle}")
    for name, detail in fails:
        print(f"FAIL {name}: {detail[:500]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
