"""Multimodal column plumbing: image/audio/video as opaque binary.

A 100 TB training pipeline carries media as ``binary`` columns with
typed metadata alongside. The Spark-side contract here is real and
tested — schema, Arrow batch shape, ``mapInPandas`` signatures,
partition sizing — while the codec work itself is stubbed: the
sandbox has no image/audio libraries, so decode is either a
clearly-marked ``NotImplementedError`` (``strict=True``) or a
deterministic fake decoder that derives pixel/sample data from the
bytes (default, keeps the plumbing testable end-to-end).

Scale notes:
- media bytes never pass through Python row-at-a-time — everything is
  ``mapInPandas`` over Arrow record batches;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (set it low for wide binary columns — 128 media rows/batch beats the
  10k default);
- metadata-only transforms (size, hash, mime sniff) stay JVM-side so
  filters on them push down to the scan without touching the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, n_bytes long, sha string"
)

# magic-byte prefixes → mime (the detect_mime_type processor analogue,
# libbeat/processors/actions/detect_mime_type.go:58 — sniffing, not
# trusting extensions)
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def media_metadata(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Stamp typed metadata for a binary column — JVM expressions only,
    the blobs are not shipped to Python."""
    c = F.col(bin_col)
    mime = F.lit("application/octet-stream")
    for prefix, m in reversed(_MAGIC):
        hexpfx = prefix.hex().upper()
        mime = F.when(
            F.upper(F.hex(F.substring(c, 1, len(prefix)))) == hexpfx, F.lit(m)
        ).otherwise(mime)
    return df.withColumns(
        {
            "n_bytes": F.octet_length(c).cast("long"),
            "sha": F.sha2(c, 256),
            "mime": mime,
        }
    )


def _fake_decode(data: bytes, h: int = 4, w: int = 4) -> list[int]:
    """Deterministic stand-in for a real image decode: h*w 'pixels'
    derived by cycling the payload bytes. Replaces PIL in this sandbox;
    the Spark-side shape (list of h*w ints per row) matches what a real
    grayscale decode-and-resize would produce."""
    if not data:
        return [0] * (h * w)
    n = h * w
    return [data[i % len(data)] for i in range(n)]


def decode_image_batches(
    bin_col: str = "content",
    id_col: str = "media_id",
    height: int = 4,
    width: int = 4,
    strict: bool = False,
):
    """``mapInPandas`` function factory: binary → fixed-size pixel array.

    strict=True raises NotImplementedError where a real decoder (PIL /
    torchvision) would be called — the marker that this stage needs the
    codec dependency in production. strict=False uses the deterministic
    fake so the pipeline shape is testable here.
    Output schema: ``{id_col} long, pixels array<int>, decode_ok boolean``.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available "
                    "in this environment; wire the codec here"
                )
            pixels = [
                _fake_decode(bytes(b) if b is not None else b"", height, width)
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pixels": pixels,
                    "decode_ok": [b is not None for b in pdf[bin_col]],
                }
            )

    return fn


def decode_images(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "media_id",
    height: int = 4,
    width: int = 4,
    strict: bool = False,
) -> DataFrame:
    out_schema = f"{id_col} long, pixels array<int>, decode_ok boolean"
    return df.select(id_col, bin_col).mapInPandas(
        decode_image_batches(bin_col, id_col, height, width, strict), out_schema
    )


def byte_histogram(df: DataFrame, bin_col: str = "content", id_col: str = "media_id",
                   n_bins: int = 16) -> DataFrame:
    """Feature-extract stub that is fully real: per-row histogram of
    byte values in ``n_bins`` buckets via ``mapInPandas`` (numpy inside
    the Arrow batch — vectorized, no per-row Python)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            for b in pdf[bin_col]:
                arr = np.frombuffer(bytes(b) if b is not None else b"", dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                hists.append(hist.astype("int64").tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "hist": hists})

    return df.select(id_col, bin_col).mapInPandas(
        fn, f"{id_col} long, hist array<long>"
    )


def sample_frames(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "media_id",
    every_n_bytes: int = 64,
    frame_bytes: int = 8,
) -> DataFrame:
    """Video frame-sampling stub: slice the payload every
    ``every_n_bytes`` into ``frame_bytes`` 'frames' (JVM expressions —
    a real implementation swaps the slicer for an ffmpeg mapInPandas
    stage with the same output schema).
    Output: ``(media_id, frame_idx, frame binary)`` exploded rows."""
    c = F.col(bin_col)
    n = F.octet_length(c)
    starts = F.sequence(
        F.lit(1), F.greatest(n - frame_bytes + 1, F.lit(1)), F.lit(every_n_bytes)
    )
    frames = F.transform(starts, lambda s: F.substring(c, s, frame_bytes))
    return (
        df.select(F.col(id_col), F.posexplode(frames).alias("frame_idx", "frame"))
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary test table (no external data): bytes
    derived from md5 chains, magic prefixes cycled across rows."""
    kinds = list(_MAGIC)
    df = spark.range(n).withColumnRenamed("id", "media_id")
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.col("media_id").cast("string"), F.lit(f":{i}:{seed}"))))
          for i in range(4)]
    )
    content = payload
    for i, (prefix, _m) in enumerate(kinds):
        content = F.when(
            F.pmod(F.col("media_id"), F.lit(len(kinds))) == i,
            F.concat(F.lit(bytearray(prefix)), payload),
        ).otherwise(content)
    return df.withColumn("content", content)
