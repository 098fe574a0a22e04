"""doin_fine_ance__spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing
capabilities of the reference personal-finance data platform
(``MarcelloMolinaro/doin_fine-ance-``, surveyed in SURVEY.md) as an
idiomatic Apache Spark engine:

- ``sources``   — batch readers for parquet/CSV landing zones and the
                  SimpleFIN-shaped ingest (driver-side fetch →
                  DataFrame), plus deterministic finance fixtures.
- ``functions`` — Postgres-compatible scalar/expression helpers
                  (ILIKE, null-ordering sorts, pandas day-of-week,
                  amount buckets, keyword flags).
- ``operators`` — reusable relational operators: latest-wins and
                  two-layer reconnection dedup, pagination,
                  keyed upsert/merge, anti-join helpers.
- ``plans``     — the finance model DAG (staging → intermediate →
                  marts) as DataFrame-returning model functions plus a
                  topological materializer (replaces dbt-on-Postgres).
- ``queries``   — the operator-inventory queries over the driver's
                  TPC-H-ish testdata, each paired with an ANSI-SQL
                  oracle (DuckDB) for hash-matched correctness.
- ``ml``        — Spark ML pipeline mirroring the reference's sklearn
                  TF-IDF + RandomForest categorizer and model registry.
- ``streaming`` — Structured Streaming windows over the events table.

Everything here targets Spark's distributed execution model: declared
DataFrame plans (Catalyst optimizes), broadcast joins for small
dimensions, date partitioning for the 100 TB layout, and no
driver-side row loops.
"""

__version__ = "0.1.0"

# Pin BLAS/OpenMP pools to one thread per process UNLESS the operator
# has sized them explicitly. Every Python worker Spark forks is already
# one core's share of the executor — numpy kernels that let OpenBLAS
# self-thread (this container's build: MAX_THREADS=2 with busy-spin
# waits) oversubscribe the box 2x and the spin-waits burn whole cores
# doing nothing. Measured on the JPEG DCT two-GEMM kernel at local[32]:
# unpinned OpenBLAS cost mm_mjpeg_frame_sample 2-3x wall-clock vs
# pinned. Set at package import so any driver process (bench, tools,
# tests, the verify entry) launches its JVM — and therefore its Python
# worker daemons, which inherit the JVM env — with the pin in place;
# get_spark() additionally sets spark.executorEnv.* for cluster mode.
import os as _os

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")
del _os
