"""WARC ingestion — the Common Crawl / web-archive interchange format.

A 100 TB pre-training pipeline starts from crawl archives, and those
ship as WARC (ISO 28500): a sequence of records, each a version line
(``WARC/1.0``), named headers, a blank line, ``Content-Length`` bytes
of payload, and a trailing blank pair. Common Crawl publishes ~100 k
``.warc.gz`` segment files per crawl; this module turns a glob of
them into a DataFrame of records with typed metadata and the raw
payload as an opaque ``binary`` column (the same multimodal-column
discipline as llm/multimodal.py — bytes never leave the executors,
downstream decode/extract stages are separate operators).

Spark-first shape:

- Files load through the built-in ``binaryFile`` DataFrame source
  (one row per file: path + content), so listing, partitioning, and
  scheduling stay Catalyst-visible — no RDD API.
- Parsing runs in :func:`pyspark.sql.DataFrame.mapInPandas`: one
  Arrow batch of files in, a stream of record rows out. Pure-stdlib
  (``gzip`` + byte scanning), no per-record Python object churn
  beyond the rows themselves.
- **Parallelism is per FILE, not per record**: a .warc.gz is a chain
  of per-record gzip members, which decompresses as a stream but is
  not block-splittable, so one file = one task. Common Crawl sizes
  segments ~1 GB for exactly this reason; at cluster scale the task
  count is the (huge) file count and this is the standard execution
  shape (cc-pyspark does the same). For re-processing the SAME
  archive repeatedly, convert once to parquet (``warc_to_parquet``)
  and let every later pass scan columnar with pushdown instead of
  re-parsing.
- ``spark.sql.files.maxPartitionBytes`` does not split binaryFile
  rows; cap per-file memory instead via ``max_file_bytes`` (oversize
  files are skipped and surfaced in the ``_skipped`` frame rather
  than OOMing an executor mid-job).

HTTP response records keep their transport headers: WARC stores the
full HTTP message. :func:`split_http_payload` separates status line /
headers / body downstream, map-only; :func:`strip_html_tags` is the
cheap JVM-side tag scrub (the regex baseline every text pipeline
starts with before a real boilerplate extractor).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

from ..compat import ensure_compat

WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF = b"\r\n"


def _parse_warc_stream(data: bytes, src: str) -> Iterator[tuple]:
    """Yield WARC_SCHEMA tuples from one (decompressed) WARC byte
    stream. Content-Length-driven — payloads may contain anything,
    including things that look like record boundaries."""
    buf = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break  # truncated trailer — no full header block left
        header_block = bytes(buf[pos:head_end]).decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            # not a record boundary (corrupt bytes): resync to the
            # next version line so one bad record doesn't eat the file
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        body_start = head_end + 4
        if length < 0 or body_start + length > n:
            break  # truncated payload
        yield (
            src,
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            length,
            bytes(buf[body_start : body_start + length]),
        )
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    max_file_bytes: int = 2 * 1024**3,
) -> tuple[DataFrame, DataFrame]:
    """Read a glob of .warc / .warc.gz files into (records, skipped).

    ``records`` follows WARC_SCHEMA, one row per WARC record.
    ``skipped`` lists files over ``max_file_bytes`` (path, length) —
    observably excluded, mirroring read_jsonl's quarantine contract.
    """
    ensure_compat(spark)
    files = spark.read.format("binaryFile").load(path)
    skipped = (
        files.filter(col("length") > max_file_bytes).select("path", "length")
    )
    eligible = files.filter(col("length") <= max_file_bytes).select(
        "path", "content"
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if path_.endswith(".gz"):
                    # multi-member gzip (one member per record in CC
                    # archives): GzipFile reads concatenated members
                    # as one stream
                    import gzip

                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                rows.extend(_parse_warc_stream(raw, path_))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return eligible.mapInPandas(parse, WARC_SCHEMA), skipped


def split_http_payload(records: DataFrame) -> DataFrame:
    """Split HTTP ``response`` payloads into status + body (map-only).

    Adds ``http_status`` (int, null for non-HTTP payloads) and
    ``body`` (binary: bytes after the header/body CRLF CRLF split;
    the whole payload when no HTTP header block is present). JVM-side
    byte ops only — no Python in the path.
    """
    # Spark's search functions are string-typed, so view the bytes
    # through ISO-8859-1 — the one charset whose decode/encode is a
    # lossless byte<->char bijection (every byte 0x00-0xFF maps to
    # U+0000-U+00FF) — find the CRLF CRLF boundary there, and encode
    # the tail back to the EXACT original bytes. The body is never
    # interpreted (it may be any charset, or gzip).
    p = F.decode(col("payload"), "ISO-8859-1")
    sep_pos = F.instr(p, "\r\n\r\n")
    status = F.regexp_extract(F.substring(p, 1, 16), r"^HTTP/[0-9.]+ (\d{3})", 1)
    tail = p.substr(sep_pos + F.lit(4), F.length(p))  # clamped to the end
    return records.withColumn(
        "http_status",
        F.when(status != "", status.cast("int")),
    ).withColumn(
        "body",
        F.when(
            F.when(status != "", status.cast("int")).isNotNull() & (sep_pos > 0),
            F.encode(tail, "ISO-8859-1"),
        ).otherwise(col("payload")),
    )


def strip_html_tags(html: F.Column) -> F.Column:
    """Cheap JVM-side HTML → text baseline: drop script/style blocks,
    strip tags, unescape the common entities, collapse whitespace.

    This is the regex floor every crawl pipeline starts from, not a
    boilerplate extractor — a real deployment swaps in trafilatura/
    jusText at this seam (same column-in/column-out contract).
    """
    no_script = F.regexp_replace(
        html, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]+>", " ")
    unescaped = no_tags
    for ent, ch in [
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
    ]:
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(unescaped, r"\s+", " "))


def warc_to_parquet(
    spark: SparkSession,
    warc_glob: str,
    out_dir: str,
    max_file_bytes: int = 2 * 1024**3,
) -> DataFrame:
    """One-pass WARC → parquet conversion (the re-processing story:
    parse the archive once, scan columnar with pushdown forever
    after). Returns the written records frame re-read from parquet."""
    records, _ = read_warc(spark, warc_glob, max_file_bytes)
    records.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)
