"""MP4 / ISO-BMFF container demux: box-tree metadata + codec triage.

The dominant crawl video container is MP4 (H.264/AAC). Full AVC decode
is out of scope for a dependency-free engine, but a real pipeline must
still TRIAGE MP4s — extract codec fourcc, dimensions, duration, and
the keyframe index, then quarantine non-decodable codecs loudly and
visibly (the codec registry's contract, llm/multimodal.py:19) instead
of failing opaquely. This module implements the public ISO/IEC
14496-12 box grammar (the 2012 edition is freely published): size+type
box headers with 64-bit largesize and to-EOF forms, FullBox
version/flags, and the ftyp/moov/trak/mdia/minf/stbl walk down to
stsd (codec sample entries), stss (sync samples), stsz, stts.

No decode claims beyond metadata: `DECODABLE_MP4_CODECS` is empty by
default, so `probe_mp4` marks every real-world MP4 quarantined with a
per-codec reason; registering a codec (e.g. if a future round adds
one) flips the verdict without touching the triage plumbing.

Reference repo contains no media handling; everything here derives
from the public spec.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4", "probe_mp4", "triage_mp4", "DECODABLE_MP4_CODECS"]

# sample-entry fourcc → decoder capability. Deliberately EMPTY: the
# engine decodes no MP4-carried codec today; the set exists so the
# triage verdict is data, not a hard-coded "no".
DECODABLE_MP4_CODECS: set[str] = set()

_CONTAINER_BOXES = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"moof", b"traf", b"udta",
}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).

    Handles size==1 (64-bit largesize) and size==0 (box extends to the
    enclosing end). Truncated or nonsense sizes raise ValueError — a
    triage pass must distinguish corrupt files from unsupported ones.
    """
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt MP4: truncated box header")
        size, btype = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("corrupt MP4: truncated largesize header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            if size < 16:
                raise ValueError("corrupt MP4: largesize smaller than header")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise ValueError(f"corrupt MP4: box size {size} smaller than header")
        if pos + size > end:
            raise ValueError(
                f"corrupt MP4: box {btype!r} overruns its container"
            )
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full_box(data: bytes, body: int):
    version = data[body]
    flags = int.from_bytes(data[body + 1 : body + 4], "big")
    return version, flags, body + 4


def _parse_trak(data: bytes, body: int, end: int) -> dict:
    track: dict = {
        "track_id": None, "handler": None, "codec": None,
        "width": None, "height": None, "timescale": None,
        "duration_ms": None, "n_samples": None, "keyframes": None,
    }
    tkhd = _find(data, body, end, b"tkhd")
    if tkhd:
        v, _, p = _full_box(data, tkhd[0])
        if v == 1:
            track["track_id"] = struct.unpack_from(">I", data, p + 16)[0]
            p_wh = p + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
        else:
            track["track_id"] = struct.unpack_from(">I", data, p + 8)[0]
            p_wh = p + 8 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
        w, h = struct.unpack_from(">II", data, p_wh)
        track["width"], track["height"] = w >> 16, h >> 16  # 16.16 fixed
    mdia = _find(data, body, end, b"mdia")
    if not mdia:
        return track
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        v, _, p = _full_box(data, mdhd[0])
        if v == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, p + 8)
        track["timescale"] = timescale
        if timescale:
            track["duration_ms"] = duration * 1000 // timescale
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        _, _, p = _full_box(data, hdlr[0])
        track["handler"] = data[p + 4 : p + 8].decode("latin-1")
    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = _find(data, minf[0], minf[1], b"stbl") if minf else None
    if not stbl:
        return track
    stsd = _find(data, stbl[0], stbl[1], b"stsd")
    if stsd:
        _, _, p = _full_box(data, stsd[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries >= 1:
            entry_size, fourcc = struct.unpack_from(">I4s", data, p + 4)
            if entry_size < 16 or p + 4 + entry_size > stsd[1]:
                raise ValueError("corrupt MP4: stsd sample entry overruns")
            track["codec"] = fourcc.decode("latin-1").strip()
            if track["handler"] == "vide" and entry_size >= 8 + 28:
                # VisualSampleEntry: 6 reserved + 2 dri + 16 predefined
                # + width(2) + height(2) at entry body offset 24
                w16, h16 = struct.unpack_from(">HH", data, p + 4 + 8 + 24)
                # prefer the sample-entry's coded size when present
                if w16 and h16:
                    track["width"], track["height"] = w16, h16
    stsz = _find(data, stbl[0], stbl[1], b"stsz")
    if stsz:
        _, _, p = _full_box(data, stsz[0])
        fixed, count = struct.unpack_from(">II", data, p)
        track["n_samples"] = count
    stss = _find(data, stbl[0], stbl[1], b"stss")
    if stss:
        _, _, p = _full_box(data, stss[0])
        (count,) = struct.unpack_from(">I", data, p)
        if p + 4 + 4 * count > stss[1]:
            raise ValueError("corrupt MP4: stss overruns its box")
        track["keyframes"] = list(
            struct.unpack_from(f">{count}I", data, p + 4)
        )
    elif track["n_samples"] is not None:
        # no stss box ⇒ every sample is a sync sample (ISO 14496-12)
        track["keyframes"] = list(range(1, track["n_samples"] + 1))
    return track


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {brand, compatible_brands, duration_ms, tracks}.

    Box-tree walk of ftyp + moov; per track: id, handler (vide/soun/…),
    codec fourcc from stsd, coded width/height, media timescale and
    duration, sample count (stsz) and the 1-based keyframe index
    (stss, or all samples when absent, per spec). Corrupt structure
    raises ValueError; unknown boxes are skipped (the spec's forward-
    compat rule).
    """
    if len(data) < 12:
        raise ValueError("not an MP4/ISO-BMFF payload (too short)")
    if data[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF payload (missing leading ftyp)")
    first = _find(data, 0, len(data), b"ftyp")
    if first is None:
        raise ValueError("not an MP4/ISO-BMFF payload (missing leading ftyp)")
    fb, fe = first
    brand = data[fb : fb + 4].decode("latin-1")
    compat = [
        data[i : i + 4].decode("latin-1") for i in range(fb + 8, fe, 4)
    ]
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("corrupt MP4: no moov box (metadata missing)")
    out: dict = {
        "brand": brand,
        "compatible_brands": compat,
        "duration_ms": None,
        "tracks": [],
    }
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    if mvhd:
        v, _, p = _full_box(data, mvhd[0])
        if v == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, p + 8)
        if timescale:
            out["duration_ms"] = duration * 1000 // timescale
    for t, b, e in _boxes(data, moov[0], moov[1]):
        if t == b"trak":
            out["tracks"].append(_parse_trak(data, b, e))
    return out


def probe_mp4(data: bytes) -> dict:
    """Triage verdict for one MP4: metadata + decodable/quarantine.

    Never raises on corrupt input — a crawl triage pass must keep
    going; corruption becomes ``{"decodable": False, "reason":
    "corrupt: …"}`` exactly like an unsupported codec does, and the
    reason string says which.
    """
    try:
        meta = parse_mp4(data)
    except ValueError as exc:
        return {
            "brand": None, "duration_ms": None, "video_codec": None,
            "audio_codec": None, "width": None, "height": None,
            "n_keyframes": None, "decodable": False,
            "reason": f"corrupt: {exc}",
        }
    video = next((t for t in meta["tracks"] if t["handler"] == "vide"), None)
    audio = next((t for t in meta["tracks"] if t["handler"] == "soun"), None)
    out = {
        "brand": meta["brand"],
        "duration_ms": meta["duration_ms"],
        "video_codec": video["codec"] if video else None,
        "audio_codec": audio["codec"] if audio else None,
        "width": video["width"] if video else None,
        "height": video["height"] if video else None,
        "n_keyframes": len(video["keyframes"]) if video and video["keyframes"] is not None else None,
    }
    undecodable = [
        t["codec"]
        for t in meta["tracks"]
        if t["codec"] and t["codec"] not in DECODABLE_MP4_CODECS
    ]
    if not meta["tracks"]:
        out["decodable"] = False
        out["reason"] = "no tracks in moov"
    elif undecodable:
        out["decodable"] = False
        out["reason"] = (
            "codec(s) "
            + ", ".join(sorted(set(undecodable)))
            + " not decodable by this engine; quarantined "
            "(register via DECODABLE_MP4_CODECS)"
        )
    else:
        out["decodable"] = True
        out["reason"] = "all track codecs registered decodable"
    return out


def triage_mp4(media):
    """Distributed MP4 triage: (media_id, mime, content binary) →
    one metadata/verdict row per file.

    The quarantine pass a 100 TB crawl runs BEFORE any decode attempt:
    map-only over Arrow batches (container bytes never leave the
    executor, only ~100-byte metadata rows shuffle), corrupt files
    become visible quarantine rows rather than task failures, and
    non-MP4 mimes reject loudly (this operator is mime-specific; the
    general registries in llm/multimodal.py handle the rest).
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("brand", StringType()),
            StructField("video_codec", StringType()),
            StructField("audio_codec", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("n_keyframes", LongType()),
            StructField("decodable", BooleanType()),
            StructField("reason", StringType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.mime != "video/mp4":
                    raise ValueError(
                        f"triage_mp4 expects video/mp4 payloads, got {r.mime!r}"
                    )
                p = probe_mp4(r.content)
                rows.append(
                    (
                        r.media_id, p["brand"], p["video_codec"],
                        p["audio_codec"], p["width"], p["height"],
                        p["duration_ms"], p["n_keyframes"], p["decodable"],
                        p["reason"],
                    )
                )
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return media.repartition("media_id").mapInPandas(kernel, schema=schema)
