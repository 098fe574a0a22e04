"""WARC ingestion: stdlib-built archives through the binaryFile +
mapInPandas reader, HTTP payload split, tag scrub, parquet landing."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from doin_fine_ance__spark.sources.warc import (
    read_warc,
    split_http_payload,
    strip_html_tags,
    warc_to_parquet,
)

HTML = (
    b"<html><head><style>b{color:red}</style></head>"
    b"<body><h1>Title &amp; more</h1><script>var x=1;</script>"
    b"<p>Hello   world</p></body></html>"
)
HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML


def _record(rec_id: str, rtype: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Type: {rtype}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"Content-Type: application/http\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _archive() -> bytes:
    return (
        _record("aaa", "warcinfo", "", b"software: test\r\n")
        + _record("bbb", "response", "http://example.com/a", HTTP)
        + _record("ccc", "response", "http://example.com/b", b"\x00\x01binary\xff")
    )


def test_read_warc_plain_and_multimember_gz(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(_archive())
    # Common Crawl shape: one gzip member per record, concatenated
    gz = b"".join(
        gzip.compress(r)
        for r in [
            _record("ddd", "response", "http://example.com/c", HTTP),
            _record("eee", "request", "http://example.com/c", b"GET /c\r\n"),
        ]
    )
    (tmp_path / "seg1.warc.gz").write_bytes(gz)

    records, skipped = read_warc(spark, str(tmp_path) + "/*")
    rows = {r.record_id: r for r in records.collect()}
    assert skipped.count() == 0
    assert len(rows) == 5
    r = rows["<urn:uuid:bbb>"]
    assert r.warc_type == "response"
    assert r.target_uri == "http://example.com/a"
    assert r.content_length == len(HTTP) and bytes(r.payload) == HTTP
    assert bytes(rows["<urn:uuid:ccc>"].payload) == b"\x00\x01binary\xff"
    assert rows["<urn:uuid:ddd>"].src_file.endswith("seg1.warc.gz")


def test_read_warc_resyncs_after_corrupt_bytes(spark, tmp_path):
    good = _record("bbb", "response", "http://example.com/a", HTTP)
    (tmp_path / "bad.warc").write_bytes(b"GARBAGE\r\nnot a record\r\n\r\n" + good)
    records, _ = read_warc(spark, str(tmp_path / "bad.warc"))
    got = records.collect()
    assert [r.record_id for r in got] == ["<urn:uuid:bbb>"]


def test_read_warc_max_file_bytes_quarantines(spark, tmp_path):
    (tmp_path / "big.warc").write_bytes(_archive())
    records, skipped = read_warc(spark, str(tmp_path / "big.warc"), max_file_bytes=10)
    assert records.count() == 0
    sk = skipped.collect()
    assert len(sk) == 1 and sk[0].path.endswith("big.warc")


def test_split_http_payload_exact_bytes_and_status(spark, tmp_path):
    (tmp_path / "seg.warc").write_bytes(_archive())
    records, _ = read_warc(spark, str(tmp_path / "seg.warc"))
    out = {r.record_id: r for r in split_http_payload(records).collect()}
    http = out["<urn:uuid:bbb>"]
    assert http.http_status == 200
    assert bytes(http.body) == HTML  # byte-exact through the latin-1 bridge
    raw = out["<urn:uuid:ccc>"]  # non-HTTP payload passes through whole
    assert raw.http_status is None
    assert bytes(raw.body) == b"\x00\x01binary\xff"


def test_strip_html_tags_drops_script_style_unescapes(spark):
    df = spark.createDataFrame([(HTML.decode(),)], "html string")
    txt = df.select(strip_html_tags(F.col("html")).alias("t")).first().t
    assert txt == "Title & more Hello world"
    assert "var x" not in txt and "color:red" not in txt


def test_warc_to_parquet_round_trip(spark, tmp_path):
    (tmp_path / "seg.warc").write_bytes(_archive())
    out = warc_to_parquet(
        spark, str(tmp_path / "seg.warc"), str(tmp_path / "pq")
    )
    assert out.count() == 3
    back = {r.record_id: bytes(r.payload) for r in out.collect()}
    assert back["<urn:uuid:bbb>"] == HTTP


def test_warc_to_corpus_pipeline_end_to_end(spark, tmp_path):
    """Crawl-to-corpus seam: WARC archive → HTTP split → tag scrub →
    documents-shaped frame → near-dup pipeline. Proves the new source
    feeds the existing dedup/quality operators without adapters."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.dedup import minhash_near_dups

    def page(i: int, body_words: str) -> bytes:
        html = (
            f"<html><body><h1>Page {i}</h1><p>{body_words}</p></body></html>"
        ).encode()
        return _record(
            f"p{i}", "response", f"http://example.com/{i}",
            b"HTTP/1.1 200 OK\r\n\r\n" + html,
        )

    dup = " ".join(f"same{j}" for j in range(30))
    archive = b"".join(
        [page(0, dup), page(1, dup)]  # near-dup pair (identical body)
        + [page(2 + i, " ".join(f"uniq{i}w{j}" for j in range(30)))
           for i in range(3)]
    )
    (tmp_path / "crawl.warc").write_bytes(archive)

    from doin_fine_ance__spark.sources.warc import read_warc, split_http_payload, strip_html_tags

    records, _ = read_warc(spark, str(tmp_path / "crawl.warc"))
    docs = (
        split_http_payload(records)
        .filter(F.col("http_status") == 200)
        .select(
            # deterministic ids from the crawl's own uris
            F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
            strip_html_tags(F.decode(F.col("body"), "UTF-8")).alias("text"),
        )
    )
    pairs = minhash_near_dups(docs, threshold=0.7).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].jaccard > 0.9  # same body, differing "Page i" header


def test_gz_parse_memory_bounded_by_record_not_archive():
    """VERDICT r4 #2: a high-compression-ratio archive (zeros
    compress ~1000×) must parse with a working set bounded by ONE
    record, not the decompressed archive. 40 records × 1 MiB = 40 MiB
    decompressed; the peak parse buffer must stay near one record."""
    from doin_fine_ance__spark.sources.warc import (
        _gzip_member_chunks,
        _parse_warc_chunks,
    )

    rec_payload = b"\x00" * (1 << 20)
    raw = b"".join(
        gzip.compress(_record(f"r{i}", "response", f"http://x/{i}", rec_payload))
        for i in range(40)
    )
    assert len(raw) < (1 << 21)  # the compressed archive really is tiny
    stats: dict = {}
    rows = list(
        _parse_warc_chunks(_gzip_member_chunks(raw), "mem.warc.gz", _stats=stats)
    )
    assert len(rows) == 40
    assert all(r[6] == len(rec_payload) and len(r[7]) == len(rec_payload) for r in rows)
    # peak buffer ≈ one record (+ decompress chunk slack), « 40 MiB
    assert stats["peak_buffer"] < 4 * (1 << 20), stats


def test_gz_member_over_chunk_then_second_member_terminates():
    """VERDICT r5 #1 regression: a gzip member whose decompressed size
    exceeds the 1 MiB decompress chunk, FOLLOWED by another member, is
    the minimal production-shaped trigger for the r5 infinite loop —
    at member EOF after a max_length-capped decompress call, CPython
    leaves the leftover compressed bytes in both unconsumed_tail and
    unused_data; consuming both duplicated the stream and re-yielded
    the final member forever (every real Common Crawl archive with a
    >1 MiB page)."""
    from doin_fine_ance__spark.sources.warc import (
        _gzip_member_chunks,
        _parse_warc_chunks,
    )

    raw = gzip.compress(
        _record("big", "response", "http://x/big", b"\x07" * ((1 << 20) + 17))
    ) + gzip.compress(_record("small", "response", "http://x/s", b"ok"))
    # bound the chunk count so a regression fails fast instead of OOMing
    chunks = []
    for i, c in enumerate(_gzip_member_chunks(raw)):
        chunks.append(c)
        assert i < 16, "gzip member stream did not terminate"
    assert sum(len(c) for c in chunks) == len(
        gzip.decompress(raw)
    )  # every byte exactly once — no duplication, no loss
    rows = list(_parse_warc_chunks(iter(chunks), "two.warc.gz"))
    assert [r[1] for r in rows] == ["<urn:uuid:big>", "<urn:uuid:small>"]


def test_frame_batches_flushes_by_rows_and_bytes():
    """ADVICE r5 (medium): read_warc's worker must flush incremental
    frames, not accumulate a file's whole expansion in one list."""
    from doin_fine_ance__spark.sources.warc import _frame_batches

    def rec(i: int, payload: bytes) -> tuple:
        return (
            "f", f"<urn:uuid:{i}>", "response", "http://x", "2026-01-01",
            "application/http", len(payload), payload, False,
        )

    # row-count flush: 10 tiny records, flush every 4 → 4+4+2
    frames = list(
        _frame_batches((rec(i, b"x") for i in range(10)), flush_rows=4)
    )
    assert [len(f) for f in frames] == [4, 4, 2]
    # byte flush: 1 MiB payloads against a 2 MiB byte cap → 2+2+1
    frames = list(
        _frame_batches(
            (rec(i, b"\x00" * (1 << 20)) for i in range(5)),
            flush_rows=1000,
            flush_bytes=2 << 20,
        )
    )
    assert [len(f) for f in frames] == [2, 2, 1]
    assert sum(len(f) for f in frames) == 5


def test_oversize_record_quarantined_and_stream_resumes(spark, tmp_path):
    """A record whose Content-Length exceeds max_record_bytes yields
    an oversize=true quarantine row (null payload, true length, REAL
    warc_type — ADVICE r5: an auditor must see what kind of record the
    cap excluded) and the records after it still parse — the payload
    is streamed past, never buffered."""
    from doin_fine_ance__spark.sources.warc import read_warc

    big = _record("big", "response", "http://x/big", b"Z" * (3 << 20))
    archive = (
        _record("aaa", "warcinfo", "", b"software: test\r\n")
        + big
        + _record("bbb", "response", "http://x/after", HTTP)
    )
    (tmp_path / "seg.warc.gz").write_bytes(gzip.compress(archive))
    records, skipped = read_warc(
        spark, str(tmp_path / "seg.warc.gz"), max_record_bytes=1 << 20
    )
    rows = {r.record_id: r for r in records.collect()}
    assert skipped.count() == 0  # file-level quarantine untouched
    assert set(rows) == {"<urn:uuid:aaa>", "<urn:uuid:big>", "<urn:uuid:bbb>"}
    over = rows["<urn:uuid:big>"]
    assert over.oversize and over.warc_type == "response"
    assert over.payload is None and over.content_length == 3 << 20
    kept = rows["<urn:uuid:bbb>"]
    assert not kept.oversize
    assert bytes(kept.payload) == HTTP  # resumed cleanly


def test_strip_html_tags_double_escaped_entities(spark):
    """ADVICE r4: '&amp;lt;' is the ESCAPED text '&lt;' — unescaping
    &amp; first would corrupt it to '<'."""
    df = spark.createDataFrame(
        [("a &amp;lt; b &amp;amp; c &amp; d",)], "html string"
    )
    txt = df.select(strip_html_tags(F.col("html")).alias("t")).first().t
    assert txt == "a &lt; b &amp; c & d"


def test_warc_to_parquet_writes_skipped_frame(spark, tmp_path):
    """ADVICE r4: conversions must not silently lose oversize files —
    the quarantine frame lands at <out_dir>/_skipped."""
    (tmp_path / "small.warc").write_bytes(_archive())
    (tmp_path / "huge.warc").write_bytes(_archive() + b"\x00" * 4096)
    out = warc_to_parquet(
        spark, str(tmp_path) + "/*.warc", str(tmp_path / "pq"),
        max_file_bytes=2048,
    )
    assert out.count() == 3  # small.warc records only
    sk = spark.read.parquet(str(tmp_path / "pq" / "_skipped")).collect()
    assert len(sk) == 1 and sk[0].path.endswith("huge.warc")


_PAGE = """
<html><head><title>T</title><script>var x=1;</script>
<style>.a{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/blog">Blog</a></nav>
<header><h1>Site name</h1></header>
<article>
<p>By Jane Roe</p>
<p>This is the first real paragraph of the article and it definitely
runs longer than eighty characters of prose content.</p>
<p>The second paragraph also carries genuine sentence content, with
enough length to be classified as good by any density measure.</p>
<div class="related"><a href="/1">Related one</a>
<a href="/2">Related two</a> <a href="/3">Related three</a></div>
</article>
<footer>Copyright 2026 <a href="/terms">Terms</a></footer>
</body></html>"""


def test_main_text_block_classifier_rules():
    """jusText/Arc90-style rules: boiler sections and link-dense
    blocks drop at any length, long prose stays, short blocks stay
    only next to good content; kill tags never leak; hostile markup
    never raises."""
    from doin_fine_ance__spark.sources.warc import _main_text

    out = _main_text(_PAGE)
    assert "first real paragraph" in out and "second paragraph" in out
    assert "By Jane Roe" in out  # near-block kept by adjacency
    for boiler in ("Home", "Site name", "Related one", "Copyright", "var x", "color:red"):
        assert boiler not in out, boiler
    # an identical short block with NO adjacent good content drops
    assert _main_text("<p>By Jane Roe</p>") == ""
    # link-dense block outside any boiler section still drops
    assert _main_text(
        '<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>'
    ) == ""
    # entity refs decode; malformed / truncated HTML is tolerated
    long_entity = "<p>Fish &amp; chips " + "served daily with mushy peas, " * 4 + "</p>"
    assert "Fish & chips" in _main_text(long_entity)
    assert _main_text("<div><p>broken <a href= oops") == ""
    assert _main_text("") == ""


def test_extract_main_text_column(spark):
    """The Spark seam: column-in/column-out over a frame of HTML
    bodies, Arrow-batched; agrees with the driver-side classifier and
    keeps strictly less than the strip_html_tags regex floor."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.sources.warc import (
        _main_text,
        extract_main_text,
        strip_html_tags,
    )

    df = spark.createDataFrame(
        [(1, _PAGE), (2, "<p>short</p>"), (3, None)], "id long, html string"
    )
    got = {
        r["id"]: (r["main"], r["floor"])
        for r in df.select(
            "id",
            extract_main_text(F.col("html")).alias("main"),
            strip_html_tags(F.col("html")).alias("floor"),
        ).collect()
    }
    assert got[1][0] == _main_text(_PAGE)
    assert "Home" in got[1][1] and "Home" not in got[1][0]  # floor keeps nav
    assert got[2][0] == ""
    assert got[3][0] == ""


def test_link_density_measured_on_normalized_text():
    """ADVICE r8: link chars must be counted on the same whitespace
    normalization as the block total, else an anchor containing
    internal runs of whitespace inflates density past 1.0 and
    misclassifies borderline blocks near the 0.33 threshold."""
    from doin_fine_ance__spark.sources.warc import _main_text, _segment_blocks

    # 30 normalized link chars inside a 100-char block = density 0.30
    # (< 0.33 → content). The anchor text carries internal whitespace
    # runs that the OLD raw-strip counting inflated to > 0.33.
    anchor = "read   the    full     original      article       here"
    prose = (
        "This paragraph carries plenty of genuine sentence content "
        "around the inline link so it stays good."
    )
    html = f"<p>{prose} <a href='/x'>{anchor}</a></p>"
    blocks = _segment_blocks(html)
    assert len(blocks) == 1
    text, link_chars, total, _ = blocks[0]
    norm_anchor = " ".join(anchor.split())
    assert link_chars == len(norm_anchor)  # normalized, not raw-strip
    assert link_chars <= total  # density can never exceed 1.0
    assert link_chars / total < 0.33
    assert norm_anchor in _main_text(html)  # block classified content

    # an all-link block still hits density ~1.0 and drops
    only_link = "<div><a href='/y'>menu   item    with   spaces</a></div>"
    (t2, l2, tot2, _), = _segment_blocks(only_link)
    assert l2 == tot2
    assert _main_text(only_link) == ""
