"""JSONL corpus ingestion/export — the LLM-pipeline interchange format.

Web-scale corpora ship as JSON Lines (one document object per line:
Common Crawl derivatives, HF datasets exports, internal crawl dumps).
This module reads/writes them with the discipline a 100 TB pipeline
needs:

- **Explicit schema, never inferSchema**: schema inference is a full
  extra pass over the data before the real read; at corpus scale that
  doubles the scan. Callers pass (or reuse) a typed schema and the
  read is a single pass.
- **Corrupt records are captured, not dropped**: a crawl dump always
  contains some broken lines. PERMISSIVE mode routes them to a
  ``_corrupt_record`` column; :func:`read_jsonl` splits them into a
  quarantine frame so loss is observable (the silent-drop failure
  mode of DROPMALFORMED is how corpora shrink mysteriously).
- **Splittability note**: gzip JSONL is NOT splittable — one 500 GB
  .json.gz becomes one task. At scale, shard into many files (the
  writer's ``partitionBy``/``repartition`` knobs) or use an
  indexed/seekable codec; plain text and bzip2 split natively.

Reference scope: the reference ingests SimpleFIN JSON over HTTP
(simplefin_source.py) — same JSON-typed columns, different transport;
the corpus surface extends it to file-based bulk interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compat import ensure_compat

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"

# Spark's JSON default timestamp format carries MILLISECONDS only
# ([.SSS]) — a parquet->jsonl->parquet round trip would silently
# truncate microseconds. Pin 6-digit fractions on both reader and
# writer (NTZ and LTZ variants).
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL under an explicit schema.

    Returns ``(good, quarantine)``: rows parsing cleanly under
    ``schema``, and corrupt rows carrying the raw line in
    ``_corrupt_record`` (their schema columns are null). Both are
    lazy views over ONE raw scan.

    CAVEAT (Spark restriction QUERY_ONLY_CORRUPT_RECORD_COLUMN): on a
    raw JSON scan, any query whose referenced columns are ONLY the
    corrupt-record column — including ``quarantine.count()`` — is
    rejected. Use :func:`land_jsonl` (bronze-layer landing, the shape
    a 100 TB ingestion uses anyway) when you need corrupt-row
    aggregates; direct reads are for pass-through pipelines that
    consume the data columns.
    """
    ensure_compat(spark)
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", multiline)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
    )
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantine = df.filter(F.col(_CORRUPT).isNotNull())
    return good, quarantine


def land_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    bronze_path: str,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Land raw JSONL into a bronze parquet table, then return
    ``(good, quarantine)`` reading from bronze.

    The one raw scan happens at write time; every downstream query —
    including corrupt-row audits — runs against columnar parquet with
    no raw-scan restrictions and no re-parse. This is the recommended
    ingestion shape at corpus scale: raw text is parsed exactly once.
    """
    ensure_compat(spark)
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", multiline)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
        .write.mode("overwrite")
        .parquet(bronze_path)
    )
    bronze = spark.read.parquet(bronze_path)
    good = bronze.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantine = bronze.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    shards: int | None = None,
) -> None:
    """Export as JSONL; ``shards`` controls output file count (at
    scale: many moderate files, never one giant gzip — see module
    docstring on splittability)."""
    out = df.repartition(shards) if shards else df
    writer = (
        out.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Documents-table JSONL (the `documents` parquet schema 1:1, so
    every registered text/dedup operator runs unchanged on the result)."""
    return read_jsonl(spark, path, DOCUMENTS_SCHEMA)


def read_events_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Events-table JSONL; ``ts`` parses from ISO-8601 strings into
    TIMESTAMP_NTZ under the UTC session pin."""
    return read_jsonl(spark, path, EVENTS_SCHEMA)
