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
starts with), and :func:`extract_main_text` is the block
text-density boilerplate extractor above it (jusText/Arc90-style,
stdlib-only; trafilatura remains the production swap at the same
column seam).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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
        T.StructField("oversize", T.BooleanType()),
    ]
)

_CRLF = b"\r\n"


def _gzip_member_chunks(raw: bytes, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip byte string as a
    stream of bounded chunks. Common Crawl archives are one gzip
    member per record; ``zlib.decompressobj(wbits=31)`` handles one
    member, so on member EOF re-seed a fresh object with the unused
    tail. Peak memory is O(chunk), not O(decompressed size)."""
    import zlib

    view = memoryview(raw)
    pos, n = 0, len(raw)
    d = zlib.decompressobj(wbits=31)
    pending = b""  # compressed bytes not yet consumed by d
    while True:
        if d.eof:  # member boundary: restart on the leftover bytes
            pending = d.unused_data + pending
            # gzip archives may zero-pad between/after members; a real
            # member starts 0x1f 0x8b, never 0x00
            pending = pending.lstrip(b"\x00")
            while not pending and pos < n:
                pending = bytes(view[pos : pos + chunk]).lstrip(b"\x00")
                pos += chunk
            if not pending:
                return
            d = zlib.decompressobj(wbits=31)
        if not pending:
            if pos >= n:
                out = d.flush()  # truncated final member: salvage tail
                if out:
                    yield out
                return
            pending = bytes(view[pos : pos + chunk])
            pos += chunk
        out = d.decompress(pending, chunk)
        # At member EOF, CPython puts the leftover compressed bytes in
        # BOTH unconsumed_tail and unused_data (when the call was also
        # capped by max_length). The eof branch above reads unused_data,
        # so taking unconsumed_tail here too would duplicate the rest of
        # the stream — re-parsing every later member forever.
        pending = b"" if d.eof else d.unconsumed_tail
        if out:
            yield out


def _parse_warc_chunks(
    chunks: Iterator[bytes],
    src: str,
    max_record_bytes: int = 1 << 30,
    _stats: dict | None = None,
) -> Iterator[tuple]:
    """Yield WARC_SCHEMA tuples from a stream of decompressed chunks.

    Content-Length-driven — payloads may contain anything, including
    things that look like record boundaries. Incremental: the working
    buffer holds at most one record (plus one chunk), so task memory
    is bounded by ``max_record_bytes`` — NOT by the archive's
    decompression ratio. A record declaring a Content-Length over the
    cap yields a quarantine row (``oversize = true``, null payload,
    real length, real warc_type — an auditor can still see WHAT kind
    of record the cap excluded) and its payload bytes are skipped
    without buffering.
    ``_stats['peak_buffer']`` records the high-water mark (test seam).
    """
    buf = bytearray()
    skip = 0  # payload bytes of an oversize record still to discard
    chunks = iter(chunks)
    eof = False

    def track() -> None:
        if _stats is not None:
            _stats["peak_buffer"] = max(_stats.get("peak_buffer", 0), len(buf))

    def fill(need: int) -> bool:
        """Grow buf to ``need`` bytes if the stream allows; False on EOF."""
        nonlocal eof
        while len(buf) < need and not eof:
            nxt = next(chunks, None)
            if nxt is None:
                eof = True
            else:
                buf.extend(nxt)
        track()
        return len(buf) >= need

    while True:
        while skip:
            if buf:
                drop = min(skip, len(buf))
                del buf[:drop]
                skip -= drop
                continue
            nxt = next(chunks, None)
            if nxt is None:
                return  # truncated inside a skipped payload
            if len(nxt) <= skip:
                skip -= len(nxt)  # discard the whole chunk, unbuffered
            else:
                buf.extend(nxt[skip:])  # keep only the post-payload tail
                skip = 0
        # skip inter-record blank lines
        while True:
            if not fill(2):
                return
            if buf[:2] == _CRLF:
                del buf[:2]
            else:
                break
        # accumulate until the header terminator is in the buffer
        head_end = buf.find(_CRLF + _CRLF)
        while head_end < 0:
            if eof or len(buf) > max_record_bytes:
                return  # truncated trailer / unbounded garbage
            fill(len(buf) + 1)
            head_end = buf.find(_CRLF + _CRLF)
        header_block = bytes(buf[:head_end]).decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            # not a record boundary (corrupt bytes): resync to the
            # next version line so one bad record doesn't eat the file
            nxt_pos = buf.find(b"WARC/", 1)
            if nxt_pos < 0:
                if eof:
                    return
                # keep a 4-byte seam so a split "WARC/" still matches
                del buf[: max(0, len(buf) - 8)]
                if not fill(len(buf) + 1):
                    return
                continue
            del buf[:nxt_pos]
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
        if length < 0:
            del buf[: head_end + 4]
            continue
        meta = (
            src,
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
        )
        if head_end + 4 + length > max_record_bytes:
            # quarantine: surface the record (real warc_type kept so
            # the audit can tell a capped response from a capped
            # conversion), stream past its payload
            yield (*meta, length, None, True)
            del buf[: head_end + 4]
            skip = length
            continue
        if not fill(head_end + 4 + length):
            return  # truncated payload
        body_start = head_end + 4
        yield (*meta, length, bytes(buf[body_start : body_start + length]), False)
        del buf[: body_start + length]


def _parse_warc_stream(
    data: bytes, src: str, max_record_bytes: int = 1 << 30
) -> Iterator[tuple]:
    """Yield WARC_SCHEMA tuples from one in-memory WARC byte stream
    (uncompressed files arrive whole from binaryFile; their size is
    already capped by ``max_file_bytes``)."""
    return _parse_warc_chunks(iter([data]), src, max_record_bytes)


def read_warc(
    spark: SparkSession,
    path: str,
    max_file_bytes: int = 2 * 1024**3,
    max_record_bytes: int = 1 << 30,
) -> tuple[DataFrame, DataFrame]:
    """Read a glob of .warc / .warc.gz files into (records, skipped).

    ``records`` follows WARC_SCHEMA, one row per WARC record.
    ``skipped`` lists files over ``max_file_bytes`` (path, length) —
    observably excluded, mirroring read_jsonl's quarantine contract.

    Memory bounds are two-level: ``max_file_bytes`` caps the
    COMPRESSED bytes binaryFile materializes per task, and
    ``max_record_bytes`` caps the DECOMPRESSED working set — .gz
    files decompress as a member-at-a-time chunk stream
    (:func:`_gzip_member_chunks`), the parser buffers at most one
    record, and ``parse`` flushes a pandas frame every
    ``flush_rows``/``flush_bytes`` records rather than accumulating a
    whole file's expansion, so a high-ratio archive (a 2 GiB .warc.gz
    expanding to 10 GiB) holds at most one flush window (~64 MiB) +
    one record in task memory. A record declaring a Content-Length
    over the cap surfaces as an ``oversize = true`` quarantine row
    (null payload, real warc_type) instead of OOMing the task.
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
        def records():
            for pdf in batches:
                for path_, content in zip(pdf["path"], pdf["content"]):
                    raw = bytes(content)
                    if path_.endswith(".gz"):
                        yield from _parse_warc_chunks(
                            _gzip_member_chunks(raw), path_, max_record_bytes
                        )
                    else:
                        yield from _parse_warc_stream(
                            raw, path_, max_record_bytes
                        )

        yield from _frame_batches(records())

    return eligible.mapInPandas(parse, WARC_SCHEMA), skipped


def _frame_batches(
    records: Iterator[tuple],
    flush_rows: int = 2048,
    flush_bytes: int = 64 << 20,
) -> Iterator["pd.DataFrame"]:  # noqa: F821 - executor-side import
    """Batch WARC record tuples into pandas frames, flushing every
    ``flush_rows`` records or ``flush_bytes`` payload bytes. Without
    this, the mapInPandas worker would accumulate a whole file's
    decompressed expansion in one list, voiding the streaming parser's
    memory bound — one flush window + one record is the real task
    working set."""
    import pandas as pd

    cols = [f.name for f in WARC_SCHEMA.fields]
    rows: list[tuple] = []
    acc = 0
    for rec in records:
        rows.append(rec)
        acc += len(rec[7] or b"")
        if len(rows) >= flush_rows or acc >= flush_bytes:
            yield pd.DataFrame(rows, columns=cols)
            rows, acc = [], 0
    if rows:
        yield pd.DataFrame(rows, columns=cols)


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
    boilerplate extractor — :func:`extract_main_text` is the
    in-sandbox extractor one rung up, and a real deployment swaps in
    trafilatura at the same column-in/column-out seam.
    """
    no_script = F.regexp_replace(
        html, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]+>", " ")
    unescaped = no_tags
    # &amp; must unescape LAST (standard ordering): doing it first
    # turns double-escaped text like "&amp;lt;" into "&lt;" and then
    # a later pass corrupts it to "<" — the source text meant "&lt;".
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
        ("&amp;", "&"),
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
    after). Returns the written records frame re-read from parquet.

    The quarantine is not silent: files over ``max_file_bytes`` are
    written to ``<out_dir>/_skipped`` (path, length). The underscore
    prefix keeps parquet readers of ``out_dir`` from picking it up
    (same convention as ``_SUCCESS``); read it explicitly to audit
    what a conversion excluded.
    """
    records, skipped = read_warc(spark, warc_glob, max_file_bytes)
    records.write.mode("overwrite").parquet(out_dir)
    skipped.write.mode("overwrite").parquet(out_dir.rstrip("/") + "/_skipped")
    return spark.read.parquet(out_dir)


# --------------------------------------------------------------- boilerplate


_KILL_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
_BOILER_SECTIONS = {"nav", "footer", "aside", "header", "form", "menu"}
_BLOCK_TAGS = {
    "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "article", "section", "blockquote", "pre", "table", "ul", "ol",
    "dd", "dt", "figcaption", "br", "tr", "main", "body",
}


def _segment_blocks(html: str) -> list[tuple[str, int, int, bool]]:
    """Parse HTML into text blocks with link-char counts.

    Returns [(text, link_chars, total_chars, in_boiler_section)].
    Pure stdlib (`html.parser`, entity refs auto-converted); tolerant
    of malformed markup like every crawl pipeline must be.
    """
    from html.parser import HTMLParser

    blocks: list[tuple[str, int, int, bool]] = []

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.kill = 0
            self.boiler = 0
            self.link = 0
            self.buf: list[str] = []
            self.link_chars = 0

        def _flush(self) -> None:
            text = " ".join("".join(self.buf).split())
            if text:
                blocks.append(
                    (text, self.link_chars, len(text), self.boiler > 0)
                )
            self.buf = []
            self.link_chars = 0

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in _KILL_TAGS:
                self.kill += 1
            if tag in _BOILER_SECTIONS:
                self._flush()
                self.boiler += 1
            if tag == "a":
                self.link += 1
            if tag in _BLOCK_TAGS:
                self._flush()

        def handle_endtag(self, tag: str) -> None:
            if tag in _KILL_TAGS:
                self.kill = max(0, self.kill - 1)
            if tag in _BOILER_SECTIONS:
                self._flush()
                self.boiler = max(0, self.boiler - 1)
            if tag == "a":
                self.link = max(0, self.link - 1)
            if tag in _BLOCK_TAGS:
                self._flush()

        def handle_data(self, data: str) -> None:
            if self.kill:
                return
            self.buf.append(data)
            if self.link:
                # measured on the same whitespace normalization the
                # block total gets at flush (" ".join(split)), so link
                # density can never exceed 1.0 for anchors containing
                # internal runs of whitespace (ADVICE r8)
                self.link_chars += len(" ".join(data.split()))

    p = _P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever parsed; crawl HTML is hostile by default
    p._flush()
    return blocks


def _main_text(
    html: str,
    min_good_chars: int = 80,
    min_near_chars: int = 10,
    max_link_density: float = 0.33,
) -> str:
    """Block text-density boilerplate extraction (jusText/Arc90-style,
    simplified and stopword-list-free so it is language-agnostic):

    - blocks inside <nav>/<footer>/<aside>/<header>/<form> are
      boilerplate outright;
    - long low-link-density blocks are content ("good");
    - link-heavy blocks (related-posts lists, menus rendered as divs)
      are boilerplate at ANY length;
    - short low-link blocks (bylines, single-sentence paragraphs) are
      kept only when adjacent to a good block — jusText's context
      rule, one smoothing pass.

    Public prior art: jusText (Pomikálek 2011) classifies blocks by
    length/link/stopword density with context smoothing; Arc90
    readability scores text-to-link ratios. This is the in-sandbox
    floor above `strip_html_tags`; trafilatura remains the production
    swap at the same column-in/column-out seam.
    """
    blocks = _segment_blocks(html)
    labels: list[str] = []
    for text, link_chars, total, in_boiler in blocks:
        density = (link_chars / total) if total else 1.0
        if in_boiler or density > max_link_density:
            labels.append("bad")
        elif total >= min_good_chars:
            labels.append("good")
        elif total >= min_near_chars:
            labels.append("near")
        else:
            labels.append("bad")
    kept: list[str] = []
    for i, (text, _, _, _) in enumerate(blocks):
        if labels[i] == "good" or (
            labels[i] == "near"
            and (
                (i > 0 and labels[i - 1] == "good")
                or (i + 1 < len(labels) and labels[i + 1] == "good")
            )
        ):
            kept.append(text)
    return "\n".join(kept)


def extract_main_text(
    html: F.Column,
    min_good_chars: int = 80,
    min_near_chars: int = 10,
    max_link_density: float = 0.33,
) -> F.Column:
    """Column-in/column-out boilerplate extractor over HTML bodies —
    the seam `strip_html_tags` documents, now filled in-sandbox (see
    :func:`_main_text` for the classifier). Arrow-batched
    `pandas_udf`: string processing with real parsing state is the
    sanctioned Python path (same discipline as the multimodal
    codecs); everything upstream (scan, filters) and downstream
    (tokenize, dedup) stays JVM-side.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _extract(col_: pd.Series) -> pd.Series:
        return col_.map(
            lambda h: _main_text(
                h or "", min_good_chars, min_near_chars, max_link_density
            )
        )

    return _extract(html)
