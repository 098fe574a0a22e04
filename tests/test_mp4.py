"""MP4 / ISO-BMFF demux + triage tests (VERDICT r11 #7).

Fixtures are hand-assembled per the public ISO/IEC 14496-12 box
grammar — a minimal-but-valid moov tree with real mvhd/tkhd/mdhd/hdlr/
stsd/stsz/stss boxes — so the parser is tested against the spec's byte
layout, not against its own writer. No decode claims: the triage
verdict for every real-world codec is quarantine-with-reason.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from doin_fine_ance__spark.llm.mp4 import (
    DECODABLE_MP4_CODECS,
    parse_mp4,
    probe_mp4,
    triage_mp4,
)


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def full_box(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return box(btype, bytes([version]) + b"\x00\x00\x00" + payload)


def _video_trak(
    track_id=1, codec=b"avc1", w=640, h=360, timescale=30000,
    duration=90000, n_samples=90, keyframes=(1, 31, 61), with_stss=True,
):
    tkhd = full_box(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">I", track_id)
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + b"\x00" * 36
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = full_box(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = full_box(b"hdlr", struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"\x00")
    # VisualSampleEntry: 6 reserved + dri + 16 predefined/reserved +
    # width + height + resolutions + reserved + frame_count +
    # compressorname(32) + depth + predefined
    vse = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = full_box(
        b"stsd",
        struct.pack(">I", 1) + struct.pack(">I4s", 8 + len(vse), codec) + vse,
    )
    stsz = full_box(b"stsz", struct.pack(">II", 0, n_samples) + b"\x00" * 4 * n_samples)
    boxes = stsd + stsz
    if with_stss:
        boxes += full_box(
            b"stss",
            struct.pack(">I", len(keyframes))
            + b"".join(struct.pack(">I", k) for k in keyframes),
        )
    stbl = box(b"stbl", boxes)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", tkhd + mdia)


def _audio_trak(track_id=2, codec=b"mp4a", timescale=44100, duration=132300):
    mdhd = full_box(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = full_box(b"hdlr", struct.pack(">I4s", 0, b"soun") + b"\x00" * 12 + b"\x00")
    ase = b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 20
    stsd = full_box(
        b"stsd",
        struct.pack(">I", 1) + struct.pack(">I4s", 8 + len(ase), codec) + ase,
    )
    stsz = full_box(b"stsz", struct.pack(">II", 0, 10) + b"\x00" * 40)
    stbl = box(b"stbl", stsd + stsz)
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    tkhd = full_box(
        b"tkhd",
        struct.pack(">III", 0, 0, track_id) + b"\x00" * 4
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0x0100, 0) + b"\x00" * 36
        + struct.pack(">II", 0, 0),
    )
    return box(b"trak", tkhd + mdia)


def make_mp4(*traks, brand=b"isom", mvhd_timescale=1000, mvhd_duration=3000):
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mvhd = full_box(
        b"mvhd",
        struct.pack(">IIII", 0, 0, mvhd_timescale, mvhd_duration)
        + b"\x00" * 80,
    )
    moov = box(b"moov", mvhd + b"".join(traks))
    mdat = box(b"mdat", b"\x00" * 64)
    return ftyp + moov + mdat


def test_parse_box_tree_and_track_metadata():
    data = make_mp4(_video_trak(), _audio_trak())
    meta = parse_mp4(data)
    assert meta["brand"] == "isom"
    assert "mp41" in meta["compatible_brands"]
    assert meta["duration_ms"] == 3000
    vid = next(t for t in meta["tracks"] if t["handler"] == "vide")
    aud = next(t for t in meta["tracks"] if t["handler"] == "soun")
    assert vid["codec"] == "avc1" and (vid["width"], vid["height"]) == (640, 360)
    assert vid["timescale"] == 30000 and vid["duration_ms"] == 3000
    assert vid["n_samples"] == 90 and vid["keyframes"] == [1, 31, 61]
    assert aud["codec"] == "mp4a" and aud["timescale"] == 44100


def test_missing_stss_means_all_sync_samples():
    meta = parse_mp4(make_mp4(_video_trak(n_samples=5, with_stss=False)))
    assert meta["tracks"][0]["keyframes"] == [1, 2, 3, 4, 5]


def test_largesize_and_to_eof_boxes():
    """64-bit largesize and size==0 (extends to EOF) box forms parse."""
    data = make_mp4(_video_trak())
    # rewrite mdat as a largesize box, then append a size-0 free box
    mdat_at = data.rfind(b"mdat") - 4
    head, mdat_payload = data[:mdat_at], data[mdat_at + 8 :]
    large = struct.pack(">I4sQ", 1, b"mdat", 16 + len(mdat_payload)) + mdat_payload
    tail_free = struct.pack(">I4s", 0, b"free") + b"\x00" * 5
    meta = parse_mp4(head + large + tail_free)
    assert meta["tracks"][0]["codec"] == "avc1"


def test_version1_boxes_parse():
    """mvhd/mdhd version 1 use 64-bit times."""
    mvhd_v1 = full_box(
        b"mvhd",
        struct.pack(">QQIQ", 0, 0, 1000, 7000) + b"\x00" * 80,
        version=1,
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200))
    trak = _video_trak()
    moov = box(b"moov", mvhd_v1 + trak)
    meta = parse_mp4(ftyp + moov)
    assert meta["duration_ms"] == 7000


def test_rejects_non_mp4_and_corrupt_loudly():
    with pytest.raises(ValueError, match="missing leading ftyp"):
        parse_mp4(b"RIFF" + b"\x00" * 100)
    with pytest.raises(ValueError, match="too short"):
        parse_mp4(b"\x00\x00")
    data = make_mp4(_video_trak())
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4(data[: data.find(b"moov") - 4])
    # box that overruns its container
    bad = bytearray(data)
    moov_at = bytes(bad).find(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(data) * 2)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(bytes(bad))


def test_probe_quarantines_real_world_codecs_with_reason():
    p = probe_mp4(make_mp4(_video_trak(codec=b"avc1"), _audio_trak(codec=b"mp4a")))
    assert p["decodable"] is False
    assert "avc1" in p["reason"] and "mp4a" in p["reason"]
    assert "quarantined" in p["reason"]
    assert (p["video_codec"], p["audio_codec"]) == ("avc1", "mp4a")
    assert (p["width"], p["height"], p["n_keyframes"]) == (640, 360, 3)
    # corrupt file becomes a quarantine verdict, not an exception
    p2 = probe_mp4(b"\x00" * 40)
    assert p2["decodable"] is False and p2["reason"].startswith("corrupt:")
    # registering a codec flips the verdict without code changes
    DECODABLE_MP4_CODECS.add("avc1")
    try:
        p3 = probe_mp4(make_mp4(_video_trak(codec=b"avc1")))
        assert p3["decodable"] is True
    finally:
        DECODABLE_MP4_CODECS.discard("avc1")


def test_triage_mp4_distributed_quarantine_path(spark):
    good = make_mp4(_video_trak(codec=b"hvc1", w=1920, h=1080), _audio_trak())
    corrupt = make_mp4(_video_trak())[:60]
    rows = [
        (1, "video/mp4", good),
        (2, "video/mp4", corrupt),
    ]
    df = spark.createDataFrame(rows, "media_id long, mime string, content binary")
    got = {r.media_id: r for r in triage_mp4(df).collect()}
    assert got[1].video_codec == "hvc1" and got[1].width == 1920
    assert got[1].decodable is False and "hvc1" in got[1].reason
    assert got[2].decodable is False and got[2].reason.startswith("corrupt:")
    # non-MP4 mime rejects loudly (registry contract)
    bad = spark.createDataFrame(
        [(3, "video/x-msvideo", good)], "media_id long, mime string, content binary"
    )
    with pytest.raises(Exception, match="expects video/mp4"):
        triage_mp4(bad).collect()
