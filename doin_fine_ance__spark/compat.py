"""Runtime-settable semantics confs, applied to ANY session.

The correctness driver owns its own SparkSession, so everything the
engine depends on for oracle-exact semantics must be a *dynamic* SQL
conf set here, not a builder-time conf:

- ``spark.sql.session.timeZone=UTC`` — DuckDB/Postgres timestamps are
  wall-clock; pin Spark to UTC so TIMESTAMP_LTZ ⇄ NTZ casts and
  collected values agree.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — some generations of
  the driver's ``events.parquet`` store INT64 TIMESTAMP(NANOS) which
  Spark refuses to read natively; with this conf it lands as LongType
  nanoseconds and :mod:`doin_fine_ance__spark.sources.testdata`
  converts to TIMESTAMP_NTZ microseconds (identical to DuckDB's
  nanos→micros truncation). Harmless when the data is
  TIMESTAMP(MICROS), which reads natively.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_COMPAT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_compat(spark: SparkSession) -> SparkSession:
    """Idempotently apply engine semantics confs to a live session."""
    for key, value in _COMPAT_CONF.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # Non-settable on some builds — leave the session as-is.
            pass
    return spark
