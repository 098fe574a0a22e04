"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata — the
only sane representation for 100 TB of mixed media in a columnar
warehouse. Decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages so the heavy bytes never leave
the executor and never materialize as Python objects row-by-row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernel is STUBBED with a deterministic fake (clearly
marked below); everything around it — schema contract, batch
iteration, partition sizing, output shape — is real and tested. Swap
``_decode_stub`` for a real decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("content", BinaryType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("feat_0", LongType()),
        StructField("feat_1", LongType()),
        StructField("feat_2", LongType()),
        StructField("feat_3", LongType()),
    ]
)


def _decode_stub(content: bytes) -> list[int]:
    """STUB decode kernel — deterministic fake 'pixels' from the bytes.

    A real deployment replaces this with PIL.Image.open /
    soundfile.read / pyav frame extraction. Raising
    NotImplementedError here would make the plumbing untestable, so the
    stub derives four stable int features from a sha256 of the payload
    (pure function of content — reproducible anywhere).
    """
    digest = hashlib.sha256(content or b"").digest()
    return [int.from_bytes(digest[i * 8 : (i + 1) * 8], "big") % (1 << 31) for i in range(4)]


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary content → fixed-width feature row.

    Operates on Arrow record batches (thousands of rows at a time); the
    per-batch loop is pandas-vectorizable for real decoders that accept
    byte buffers.
    """
    for pdf in batches:
        feats = pdf["content"].map(_decode_stub)
        out = pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b or b"")).astype("int64"),
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "feat_0": feats.map(lambda f: f[0]).astype("int64"),
                "feat_1": feats.map(lambda f: f[1]).astype("int64"),
                "feat_2": feats.map(lambda f: f[2]).astype("int64"),
                "feat_3": feats.map(lambda f: f[3]).astype("int64"),
            }
        )
        yield out


def extract_media_features(media: DataFrame) -> DataFrame:
    """Distributed decode/feature pass over a media table.

    Repartitions by media_id first so batch sizes stay uniform when the
    source was written with skewed file sizes (big videos cluster).
    """
    return media.repartition("media_id").mapInPandas(
        decode_media_batch, schema=FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — requires a real imaging library.

    Plumbing contract: same mapInPandas shape as
    :func:`extract_media_features`, output schema = MEDIA_SCHEMA with
    updated width/height/content.
    """
    raise NotImplementedError(
        "resize_images needs an imaging library (PIL) not present in this "
        "environment; the decode/feature path (extract_media_features) "
        "demonstrates the full Spark-side plumbing."
    )


def sample_video_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling stage — requires a video codec (pyav/ffmpeg)."""
    raise NotImplementedError(
        "sample_video_frames needs a video codec not present in this "
        "environment; see extract_media_features for the plumbing pattern."
    )
